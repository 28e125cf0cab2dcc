package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text

/** x17 stage-cost decomposition at a given sf (dev tool). */
object X17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    def t(name: String)(f: => Long): Unit = {
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"[x17probe] $name%-28s ${xs.map(_._1).sorted.apply(1)}%6.2fs rows=${xs.head._2}")
    }
    docs.count() // warm
    val docWord = docs
      .select(col("doc_id"), explode(Text.words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    t("docWord (explode+groupBy)")(docWord.count())
    val dfT = docWord.groupBy(col("w")).agg(count(lit(1)).as("df"))
    t("dfT vocab")(dfT.count())
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = docWord.join(dfT, Seq("w")).crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * (length(bin(col("n_docs"))) - length(bin(col("df"))) + 1))
          .cast("long"))
    t("scored (join+score)")(scored.count())
    val Big = 1000000000000L
    val key = concat_ws(" ",
      lpad((lit(Big) - col("score")).cast("string"), 13, "0"),
      hex(col("w").cast("binary")), col("tf").cast("string"),
      col("df").cast("string"))
    t("keys built")(scored.select(col("doc_id"), key.as("__k")).count())
    t("topk agg")(scored.select(col("doc_id"), key.as("__k"))
      .groupBy(col("doc_id"))
      .agg(graft.dedup.Dedup.collectMinK(col("__k"), 5).as("__top")).count())
    t("x17 full")(graft.operators.Pipeline.tfidfTopTerms(docs, "doc_id", "text", 5).count())
    // isolate the delta between the probe chain (1.3s) and full (4.1s)
    val invScore = when(col("score") >= lit(Big),
        raise_error(concat(lit("boom: "), col("score").cast("string"))))
      .otherwise(lit(Big) - col("score"))
    val keyRe = concat_ws(" ",
      lpad(invScore.cast("string"), 13, "0"),
      hex(col("w").cast("binary")), col("tf").cast("string"),
      col("df").cast("string"))
    t("topk agg + raise_error key")(scored.select(col("doc_id"), keyRe.as("__k"))
      .groupBy(col("doc_id"))
      .agg(graft.dedup.Dedup.collectMinK(col("__k"), 5).as("__top")).count())
    val agged = scored.select(col("doc_id"), keyRe.as("__k"))
      .groupBy(col("doc_id"))
      .agg(graft.dedup.Dedup.collectMinK(col("__k"), 5).as("__top"))
    val outStage = agged
      .select(col("doc_id"), posexplode(col("__top")).as(Seq("__pos", "__k")))
      .withColumn("__p", split(col("__k"), " "))
      .select(col("doc_id"), (col("__pos") + 1).as("rank"),
        unhex(col("__p").getItem(1)).cast("string").as("term"),
        col("__p").getItem(2).cast("long").as("tf"),
        col("__p").getItem(3).cast("long").as("df"),
        (lit(Big) - col("__p").getItem(0).cast("long")).as("score"))
    t("full minus orderBy")(outStage.count())
    t("full with orderBy")(outStage.orderBy("doc_id", "rank").count())
    // save/restore the previously EFFECTIVE value, not a hardcoded
    // default — anything run after the probe keeps its session behavior
    val fbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val fbPrev = spark.conf.getOption(fbKey)
    spark.conf.set(fbKey, "10000000")
    try t("full, no sort-based fallback")(
      graft.operators.Pipeline.tfidfTopTerms(docs, "doc_id", "text", 5).count())
    finally fbPrev match {
      case Some(v) => spark.conf.set(fbKey, v)
      case None => spark.conf.unset(fbKey)
    }

    // v3: docWord materialized ONCE (localCheckpoint), df derived from it
    def v3(): Long = {
      val dw = docs
        .select(col("doc_id"), explode(Text.words(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dfT3 = dw.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val scored3 = dw.join(dfT3, Seq("w")).crossJoin(broadcast(n))
        .withColumn("score",
          (col("tf") * (length(bin(col("n_docs"))) - length(bin(col("df"))) + 1))
            .cast("long"))
      val out = scored3.select(col("doc_id"), keyRe.as("__k"))
        .groupBy(col("doc_id"))
        .agg(graft.dedup.Dedup.collectMinK(col("__k"), 5).as("__top"))
        .select(col("doc_id"), posexplode(col("__top")).as(Seq("__pos", "__k")))
        .withColumn("__p", split(col("__k"), " "))
        .select(col("doc_id"), (col("__pos") + 1).as("rank"),
          unhex(col("__p").getItem(1)).cast("string").as("term"))
        .orderBy("doc_id", "rank")
        .count()
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistLocalCheckpoint(dw)
      out
    }
    t("v3 checkpointed docWord")(v3())

    // v2: in-row tf (no token-level shuffle, docWord computed once)
    val ws = docs.select(col("doc_id"), Text.words(col("text")).as("__ws"))
    val withTf = ws.select(col("doc_id"),
        explode(transform(array_distinct(col("__ws")),
          w => struct(w.as("w"),
            size(filter(col("__ws"), x => x === w)).cast("long").as("tf"))))
          .as("wt"))
      .select(col("doc_id"), col("wt.w").as("w"), col("wt.tf").as("tf"))
    t("v2 in-row tf")(withTf.count())
    val dfT2 = withTf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored2 = withTf.join(dfT2, Seq("w")).crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * (length(bin(col("n_docs"))) - length(bin(col("df"))) + 1))
          .cast("long"))
    val key2 = concat_ws(" ",
      lpad((lit(Big) - col("score")).cast("string"), 13, "0"),
      hex(col("w").cast("binary")), col("tf").cast("string"),
      col("df").cast("string"))
    t("v2 full")(scored2.select(col("doc_id"), key2.as("__k"))
      .groupBy(col("doc_id"))
      .agg(graft.dedup.Dedup.collectMinK(col("__k"), 5).as("__top")).count())
    spark.stop()
  }
}
