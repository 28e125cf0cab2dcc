package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.temporal.Temporal
import graft.operators.TimeSeries

/** Scaling probe (dev tool): times the core temporal/time-series
  * operators on events at 1x (sf0.1, ~100k rows) and on a synthesized
  * 8x union (distinct key ranges, written once to /tmp) to check the
  * operators behave ~linearly — i.e. no accidental quadratic joins,
  * driver materialization, or partition collapse as data grows.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val bigPath = "/tmp/graft_scale/events8"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e1 = Tables.events(spark, sfDir)
    if (!new java.io.File(bigPath).exists()) {
      val parts = (0 until 8).map { i =>
        e1.withColumn("user_id", col("user_id") + lit(i * 1000L))
          .withColumn("event_id", col("event_id") + lit(i * 10000000L))
      }
      parts.reduce(_ unionByName _)
        .repartition(32).write.parquet(bigPath)
    }
    val e8 = spark.read.parquet(bigPath)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def suite(name: String, ev: DataFrame): Map[String, Double] = {
      val at = lit("2024-01-20 00:00:00").cast("timestamp")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts")
      Map(
        "asof" -> time(Temporal.asOf(ev, "user_id", "ts", "event_id", at).count()),
        "asof_interp" -> time(Temporal.asOfInterpolate(
          ev.select("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", "value", at).count()),
        "sessionize" -> time(TimeSeries.sessionize(
          ev.select("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", "value", 1800L).count()),
        "tumbling" -> time(TimeSeries.tumblingDaily(ev, "event_type", "ts", "value").count()),
        "interval_join" -> time(TimeSeries.intervalCount(
          purchases, clicks, "user_id", "ts", "event_id", 3600000000L).count()),
        "ewma" -> time(TimeSeries.ewma(
          ev.select("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", "value", 0.5, 3).count()),
        "zscore" -> time(TimeSeries.zscoreAnomalies(
          ev, "event_type", "event_id", "value", 2.5).count()),
        "changes" -> time(Temporal.changesBetween(
          ev.select("user_id", "ts", "event_id", "event_type", "value"),
          "user_id", "ts", "event_id",
          lit("2024-01-10 00:00:00").cast("timestamp"),
          lit("2024-01-25 00:00:00").cast("timestamp"),
          Seq("event_type", "value")).count()))
    }
    suite("warm", e1) // warm-up
    val r1 = suite("1x", e1)
    val r8 = suite("8x", e8)
    println(f"${"op"}%-14s ${"1x(s)"}%8s ${"8x(s)"}%8s ratio")
    r1.keys.toSeq.sorted.foreach { k =>
      println(f"$k%-14s ${r1(k)}%8.2f ${r8(k)}%8.2f ${r8(k) / r1(k)}%5.1fx")
    }

    // dedup family over 8x documents. Each replica's characters are
    // rotated so replica shingle spaces are DISJOINT — this measures
    // operator scaling at 8x corpus size. (With shared text the same
    // probe measures the candidate-pair blowup instead: shingle
    // postings ×8 → ×64 join output — 27x measured for exact Jaccard —
    // which is the corpus property that makes MinHash-LSH, whose
    // band buckets stay tiny, the 100 TB path.)
    val docsPath = "/tmp/graft_scale/documents8"
    val d1 = graft.sources.Tables.documents(spark, sfDir)
    if (!new java.io.File(docsPath).exists()) {
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val parts = (0 until 8).map { i =>
        val rotated = alpha.drop(i) + alpha.take(i)
        d1.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", translate(col("text"), alpha, rotated))
      }
      parts.reduce(_ unionByName _).repartition(32).write.parquet(docsPath)
    }
    val d8 = spark.read.parquet(docsPath)
    def dedupSuite(docs: DataFrame): Map[String, Double] = Map(
      "minhash_lsh" -> time(graft.dedup.Dedup
        .minhashLshPairs(docs, "doc_id", "text", 3, 16, 4).count()),
      "jaccard" -> time(graft.dedup.Dedup
        .ngramJaccardPairs(docs, "doc_id", "text", 3, 0.12).count()),
      "simhash" -> time(graft.dedup.Dedup
        .simhashFingerprints(docs, "doc_id", "text", 8).count()),
      "bigrams" -> time(docs.select(explode(
        graft.functions.Text.bigrams(col("text")))).count()))
    dedupSuite(d1) // warm-up
    val d1r = dedupSuite(d1)
    val d8r = dedupSuite(d8)
    println(f"${"dedup op"}%-14s ${"1x(s)"}%8s ${"8x(s)"}%8s ratio")
    d1r.keys.toSeq.sorted.foreach { k =>
      println(f"$k%-14s ${d1r(k)}%8.2f ${d8r(k)}%8.2f ${d8r(k) / d1r(k)}%5.1fx")
    }

    // skew: the same 8x volume but EVERY row on one key. The bucketized
    // interval join keeps its parallelism (the hot key shards across
    // time buckets); pure per-key windows (sessionize) collapse to one
    // partition — the documented case for Skew.salted* / AQE.
    val eSkew = e8.withColumn("user_id", lit(1L))
    def skewSuite(ev: DataFrame): Map[String, Double] = {
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts")
      Map(
        "interval_join" -> time(TimeSeries.intervalCount(
          purchases, clicks, "user_id", "ts", "event_id", 3600000000L).count()),
        "sessionize" -> time(TimeSeries.sessionize(
          ev.select("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", "value", 1800L).count()))
    }
    val uni = skewSuite(e8)
    val skw = skewSuite(eSkew)
    println(f"${"8x skew op"}%-14s ${"uniform"}%8s ${"1-key"}%8s ratio")
    uni.keys.toSeq.sorted.foreach { k =>
      println(f"$k%-14s ${uni(k)}%8.2f ${skw(k)}%8.2f ${skw(k) / uni(k)}%5.1fx")
    }
    spark.stop()
  }
}
