package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Append-mode + watermark semantics across micro-batches: a window is
  * emitted exactly once, only after the watermark passes its end, and
  * never again — the unbounded-source production shape. */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, rows: (String, String)*): Unit =
    rows.toDF("ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .select("ts", "event_type")
      .coalesce(1).write.mode("append").parquet(dir)

  test("windows finalize only after the watermark passes them") {
    val dir = java.nio.file.Files.createTempDirectory("wm").toString
    writeBatch(dir,
      ("2024-01-01 10:00:10", "click"),
      ("2024-01-01 10:01:00", "click"),
      ("2024-01-01 10:02:00", "view"))

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = Streams.tumblingCountsWithWatermark(stream, "5 minutes", "1 minute")
    val q = agg.writeStream.format("memory").queryName("graft_wm")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // watermark (10:02 - 1min) hasn't passed the window end 10:05
      assert(spark.table("graft_wm").count() == 0)

      // late-arriving batch pushes the watermark past 10:05
      writeBatch(dir, ("2024-01-01 10:10:00", "click"))
      q.processAllAvailable()
      val got = spark.table("graft_wm")
        .select(date_format($"win_start", "HH:mm").as("w"), $"event_type", $"n")
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(("10:00", "click", 2L), ("10:00", "view", 1L)))

      // the finalized window is never re-emitted
      writeBatch(dir, ("2024-01-01 10:20:00", "view"))
      q.processAllAvailable()
      assert(spark.table("graft_wm").count() == 3) // +1 for the 10:10 window
    } finally q.stop()
  }
}
