package graft

import org.apache.spark.sql.functions._
import graft.temporal.{TemporalVault, TimeParse}

/** Reference-parity extras: NL timestamps, the query cache with
  * write-invalidation, and the operation metrics counters. */
class ParityExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("natural-language timestamps parse deterministically") {
    val now = "2024-01-20 16:30:00"
    assert(TimeParse.parse("now", now) == now)
    assert(TimeParse.parse("today", now) == "2024-01-20 00:00:00")
    assert(TimeParse.parse("yesterday at 4:00 PM", now) == "2024-01-19 16:00:00")
    assert(TimeParse.parse("2 hours ago", now) == "2024-01-20 14:30:00")
    assert(TimeParse.parse("in 3 days", now) == "2024-01-23 16:30:00")
    assert(TimeParse.parse("2024-01-05", now) == "2024-01-05 00:00:00")
    assert(TimeParse.parse("2024-01-05 10:11:12", now) == "2024-01-05 10:11:12")
  }

  test("query cache serves repeats and invalidates on write") {
    val dir = java.nio.file.Files.createTempDirectory("vault_cache").toString
    val v = new TemporalVault(spark, dir)
    def batch(rows: (String, String, Long, String)*) =
      rows.toDF("record_id", "ts_s", "seq", "data")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("record_id", "ts", "seq", "data")
    v.append(batch(("u1", "2024-01-01 00:00:00", 1, "a")))

    val t = "2024-01-02 00:00:00"
    assert(v.queryCached(t).count() == 1)
    val hitsBefore = v.cacheHits
    assert(v.queryCached(t).count() == 1)
    assert(v.cacheHits == hitsBefore + 1)

    // write invalidates: the new version must be visible
    v.append(batch(("u2", "2024-01-01 12:00:00", 2, "x")))
    assert(v.queryCached(t).count() == 2)

    // NL phrasing resolves through the same read path
    assert(v.queryAt("yesterday", "2024-01-03 09:00:00").count() == 2)
  }

  test("metrics count operations and accumulate latency") {
    Metrics.install(spark)
    val before = Metrics.count("asof_read")
    Metrics.timed(spark, "asof_read") {
      graft.sources.Tables.events(spark, sfDir).limit(5).count()
    }
    assert(Metrics.count("asof_read") == before + 1)
    assert(Metrics.totalSeconds("asof_read") >= 0.0)
  }
}
