package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming twins of the batch time-series operators: same
  * declarative aggregation, incremental execution. The batch parquet dir
  * drives the stream (one AvailableNow-style drain via
  * `processAllAvailable`), so results are provably batch-equivalent —
  * the batch-derived oracle SQL validates the streaming output verbatim.
  *
  * At scale the same plans run against a live source (Kafka/files) with
  * a watermark + append mode; complete-mode-over-memory here is the
  * test harness shape.
  */
object Streams {

  /** events as a stream with the nanos ts normalized, like Tables.events. */
  private def eventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file source wants a directory: stream the sf dir, filtered to
    // the events file
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Run `agg` to completion over all available input; return the final
    * result table. */
  private def drainToTable(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    spark.streams.active.filter(_.name == name).foreach(_.stop())
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Streaming daily tumbling aggregate over events (twin of
    * TimeSeries.tumblingDaily). */
  def tumblingDailyStream(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventStream(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    drainToTable(spark, agg, "graft_ts11")
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("n"), col("sum_value"),
        round(col("sum_value") / col("n"), 6).as("avg_value"))
  }

  /** Streaming gap-based sessionization (twin of TimeSeries.sessionize)
    * via native `session_window` — incremental per-key session state
    * instead of a batch window sort; at scale this is the stateful-agg
    * path with a watermark evicting closed sessions. Emits the same
    * (user, start, end, n, total) rows as the batch operator. */
  def sessionizeStream(spark: SparkSession, sfDir: String, gap: String): DataFrame = {
    val agg = eventStream(spark, sfDir)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
    drainToTable(spark, agg, "graft_ts12")
      .select("user_id", "start_us", "end_us", "n_events", "total_value")
  }
}
