package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: batch-level decomposition of one drain. */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("drainprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_PARTS", "8"))
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val raw =
      if (new java.io.File(path).isDirectory)
        s.readStream.schema(schema).parquet(path)
      else
        s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val ev = if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val q = ev.groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(s"probe$rep")
        .option("checkpointLocation", s"/dev/shm/graft_probe/$rep-${System.nanoTime()}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("complete").start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"rep $rep wall=${"%.3f".format(wall)}s batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"triggerMs=${p.durationMs.get("triggerExecution")} " +
          s"addBatch=${p.durationMs.get("addBatch")} getBatch=${p.durationMs.get("getBatch")} " +
          s"planning=${p.durationMs.get("queryPlanning")} walCommit=${p.durationMs.get("walCommit")} " +
          s"commitOffsets=${p.durationMs.get("commitOffsets")} latestOffset=${p.durationMs.get("latestOffset")}")
      }
    }
    spark.stop()
  }
}
