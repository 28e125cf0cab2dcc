package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming twins of the batch time-series operators: same
  * declarative aggregation, incremental execution. The batch parquet dir
  * drives the stream (one AvailableNow-style drain via
  * `processAllAvailable`), so results are provably batch-equivalent —
  * the ts1 oracle SQL validates the streaming output verbatim.
  *
  * At scale the same plan runs against a live source (Kafka/files) with
  * a watermark + append mode; complete-mode-over-memory here is the
  * test harness shape.
  */
object Streams {

  /** Streaming daily tumbling aggregate over events (twin of
    * TimeSeries.tumblingDaily). Drains all available input synchronously
    * and returns the final result table. */
  def tumblingDailyStream(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val name = "graft_ts11"
    spark.streams.active.filter(_.name == name).foreach(_.stop())

    // the file source wants a directory: stream the sf dir, filtered to
    // the events file
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val events =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    val agg = events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("n"), col("sum_value"),
        round(col("sum_value") / col("n"), 6).as("avg_value"))
  }
}
