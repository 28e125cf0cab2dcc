package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe for the streaming drains (not part of the driver
  * contract): times the four streaming queries so the
  * GRAFT_STREAM_PARTS state-partition knob can be A/B'd:
  *
  *   GRAFT_STREAM_PARTS=4 sbt "runMain graft.StreamProbe"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/events.parquet").count() // warm file index
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    (1 to 2).foreach { round =>
      println(s"-- round $round (parts=${sys.env.getOrElse("GRAFT_STREAM_PARTS", "auto")})")
      time("ts11 tumbling")(
        graft.streaming.Streams.tumblingDailyStream(spark, sfDir).count())
      time("ts12 sessionize")(
        graft.streaming.Streams.sessionizeStream(spark, sfDir, "30 minutes").count())
      time("ts17 interval join")(
        graft.streaming.Streams.intervalJoinStream(spark, sfDir).count())
      time("ts21 version monitor")(
        graft.streaming.Streams.versionMonitorStream(spark, sfDir).count())
    }
    // GRAFT_STREAM_BREAKDOWN=1: decompose the ts12 drain wall into
    // batch-agg work vs state-store machinery vs memory-sink collect
    if (sys.env.get("GRAFT_STREAM_BREAKDOWN").contains("1")) {
      println("-- ts12 floor decomposition (median-ish: 2nd of 2 warm runs)")
      import org.apache.spark.sql.functions.col
      val ev = graft.sources.Tables.events(spark, sfDir)
        .select("user_id", "ts", "event_id", "value")
      (1 to 2).foreach { _ =>
        time("batch twin")(graft.operators.TimeSeries
          .sessionize(ev, "user_id", "ts", "event_id", "value", 1800L).count())
        time("stream foreachBatch")(graft.streaming.Streams
          .sessionizeStreamCountOnly(spark, sfDir, "30 minutes"))
        time("stream memory sink")(graft.streaming.Streams
          .sessionizeStream(spark, sfDir, "30 minutes").count())
      }
    }
    spark.stop()
  }
}
