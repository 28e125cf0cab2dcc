package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text

/** x11/x14: lazy (exchange-reuse?) vs checkpointed docWord A/B. */
object X11Probe {
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
    docs.count()
    def t(name: String)(f: => Long): Unit = {
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"[x11probe] $name%-24s ${xs.map(_._1).sorted.apply(1)}%6.2fs rows=${xs.head._2}")
    }
    def dwLazy(): DataFrame = docs
      .select(col("doc_id"), explode(Text.words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    def x11(dw: DataFrame): DataFrame = {
      val wordCnt = dw.groupBy(col("w")).agg(sum(col("tf")).as("cnt"))
      dw.join(wordCnt, Seq("w"))
        .groupBy(col("doc_id")).agg(
          sum(col("tf")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("tf") * when(col("cnt") <= 2, 1).otherwise(0)).as("rare_tokens"),
          sum(col("tf") * length(bin(col("cnt")))).as("sum_bits"),
          min(col("cnt")).as("min_cnt"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("rare_tokens"), col("min_cnt"),
          round(col("sum_bits") / col("n_tokens"), 6).as("avg_bits"))
        .orderBy("doc_id")
    }
    def x14(dw: DataFrame): DataFrame = {
      val wordCnt = dw.groupBy(col("w")).agg(sum(col("tf")).as("cnt"))
      val perDoc = dw.join(wordCnt, Seq("w"))
        .groupBy(col("doc_id")).agg(
          sum(col("tf")).as("n_tokens"),
          sum(col("tf") * length(bin(col("cnt")))).as("sum_bits"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy((col("sum_bits") / col("n_tokens")).asc, col("doc_id").asc)
      perDoc.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .withColumn("bucket", ntile(3).over(w))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
          min(col("doc_id")).as("first_id"))
        .orderBy("lang", "bucket")
    }
    t("x11 lazy")(x11(dwLazy()).count())
    t("x14 lazy")(x14(dwLazy()).count())
    def ck[T](f: DataFrame => DataFrame): Long = {
      val dw = dwLazy().localCheckpoint()
      val out = f(dw).count()
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistLocalCheckpoint(dw)
      out
    }
    t("x11 checkpointed")(ck(x11))
    t("x14 checkpointed")(ck(x14))
    println("[x11probe] lazy x11 final plan (exchange reuse?):")
    val reused = x11(dwLazy()).queryExecution.executedPlan.toString
    println("[x11probe] ReusedExchange in lazy x11 plan: " +
      reused.contains("ReusedExchange"))
    spark.stop()
  }
}
