package graft

import org.apache.spark.sql.functions._
import graft.temporal.TemporalVault

/** End-to-end lifecycle of the durable store façade: append versions,
  * time-travel, snapshot fast path, append-only rollback with
  * tombstones, audit history — the reference's whole API surface
  * (reference app/main.py) against a temp directory. */
class TemporalVaultSpec extends SparkSpec {
  import spark.implicits._

  private def mkVault(): TemporalVault = {
    val dir = java.nio.file.Files.createTempDirectory("vault").toString
    new TemporalVault(spark, dir)
  }

  test("record-cache invalidation: precise under the id cap, flush-all past it") {
    val dir = java.nio.file.Files.createTempDirectory("vault").toString
    // cache can hold 8 record entries but the precise-diff path is
    // capped at 4 ids — past it the whole record cache must flush
    val v = new TemporalVault(spark, dir, cacheMaxEntries = 8, invalidateIdCap = 4)
    v.append(batch((1 to 6).map(i =>
      (s"u$i", "2024-01-01 00:00:00", i.toLong, "a")): _*))

    // UNDER the cap: 3 cached ids, batch touches u1 only -> u2/u3 stay hot
    Seq("u1", "u2", "u3").foreach(id => v.recordCached(id).count())
    val hits0 = v.cacheStats("hits")
    v.append(batch(("u1", "2024-01-02 00:00:00", 10, "b")))
    v.recordCached("u2").count(); v.recordCached("u3").count()
    assert(v.cacheStats("hits") == hits0 + 2, "untouched ids were invalidated")
    val miss0 = v.cacheStats("misses")
    v.recordCached("u1").count()
    assert(v.cacheStats("misses") == miss0 + 1, "touched id survived invalidation")
    assert(v.recordCached("u1").select("data").as[String].head() == "b")

    // PAST the cap: 6 cached ids > cap 4 -> flush-all (every id misses),
    // and no unbounded isin/collect runs against the append
    (1 to 6).foreach(i => v.recordCached(s"u$i").count())
    v.append(batch(("u9", "2024-01-03 00:00:00", 20, "c")))
    val missFlush = v.cacheStats("misses")
    (1 to 6).foreach(i => v.recordCached(s"u$i").count())
    assert(v.cacheStats("misses") == missFlush + 6,
      "flush-all path left stale entries cached")
  }

  private def batch(rows: (String, String, Long, String)*) =
    rows.toDF("record_id", "ts_s", "seq", "data")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .select("record_id", "ts", "seq", "data")

  test("append + query + history + compare lifecycle") {
    val v = mkVault()
    v.append(batch(
      ("u1", "2024-01-01 00:00:00", 1, "a"),
      ("u1", "2024-01-03 00:00:00", 2, "b"),
      ("u2", "2024-01-02 00:00:00", 3, "x")))

    // time-travel read (GET /query)
    assert(v.query("2024-01-02 12:00:00").select("record_id", "data")
      .as[(String, String)].collect().toSet == Set(("u1", "a"), ("u2", "x")))

    // version labels (POST /records numbering)
    assert(v.history("u1").select("version", "data")
      .as[(String, String)].collect().toSet == Set(("v1", "a"), ("v2", "b")))

    // field diff (GET /compare)
    val diff = v.compare("u1", "2024-01-01 12:00:00", "2024-01-04 00:00:00", Seq("data"))
      .select("data_from", "data_to", "changed_fields")
      .as[(String, String, String)].collect()
    assert(diff.toSeq == Seq(("a", "b", "data")))
  }

  test("rollback appends compensation + tombstones and audits") {
    val v = mkVault()
    v.append(batch(
      ("u1", "2024-01-01 00:00:00", 1, "a"),
      ("u1", "2024-01-05 00:00:00", 2, "b"),   // after rollback point
      ("u3", "2024-01-06 00:00:00", 3, "new"))) // created after rollback point

    val audit = v.rollback("2024-01-02 00:00:00", "2024-01-10 00:00:00")
    assert(audit.select("affected_records", "record_ids")
      .as[(Long, String)].head() == ((2L, "u1,u3")))

    // state after rollback: u1 restored to "a", u3 gone
    val state = v.query("2024-01-10 00:00:00").select("record_id", "data")
      .as[(String, String)].collect().toSet
    assert(state == Set(("u1", "a")))

    // history between rollback point and rollback stays queryable
    val mid = v.query("2024-01-06 00:00:00").select("record_id", "data")
      .as[(String, String)].collect().toSet
    assert(mid == Set(("u1", "b"), ("u3", "new")))

    assert(v.rollbackHistory.count() == 1)
  }

  test("rollbackHistory(limit) pages newest-first like the reference endpoint") {
    val v = mkVault()
    v.append(batch(("u1", "2024-01-01 00:00:00", 1, "a")))
    v.append(batch(("u1", "2024-01-02 00:00:00", 2, "b")))
    v.append(batch(("u1", "2024-01-03 00:00:00", 3, "c")))
    v.rollback("2024-01-01 12:00:00", "2024-01-10 00:00:00")
    v.rollback("2024-01-02 12:00:00", "2024-01-11 00:00:00")
    v.rollback("2024-01-03 12:00:00", "2024-01-12 00:00:00")
    assert(v.rollbackHistory.count() == 3)
    val top2 = v.rollbackHistory(2).select("rollback_ts").as[String].collect()
    assert(top2.toSeq == Seq("2024-01-12 00:00:00", "2024-01-11 00:00:00"))
  }

  test("versionsAsOf dumps every version <= at, not latest-per-record") {
    val v = mkVault()
    v.append(batch(
      ("u1", "2024-01-01 00:00:00", 1, "a"),
      ("u1", "2024-01-03 00:00:00", 2, "b"),
      ("u1", "2024-01-05 00:00:00", 3, "c"),
      ("u2", "2024-01-02 00:00:00", 4, "x")))
    // GET /query?timestamp=T literal semantics: ALL versions with
    // ts <= T (app/main.py:127-129) — u1 contributes v1 AND v2
    val dump = v.versionsAsOf("2024-01-04 00:00:00")
      .select("record_id", "version", "data")
      .as[(String, String, String)].collect().toSet
    assert(dump == Set(
      ("u1", "v1", "a"), ("u1", "v2", "b"), ("u2", "v1", "x")))
    // labels on the pruned prefix match labels over the full log
    val full = v.versionedLog.filter($"record_id" === "u1")
      .select("version", "data").as[(String, String)].collect().toSet
    assert(full == Set(("v1", "a"), ("v2", "b"), ("v3", "c")))
  }

  test("compaction preserves reads at and after the compaction point") {
    val v = mkVault()
    v.append(batch(
      ("u1", "2024-01-01 00:00:00", 1, "a"),
      ("u1", "2024-01-03 00:00:00", 2, "b"),
      ("u2", "2024-01-02 00:00:00", 3, "x"),
      ("u1", "2024-01-08 00:00:00", 4, "c")))
    v.rollback("2024-01-04 00:00:00", "2024-01-09 00:00:00") // undoes "c"

    val newRoot = java.nio.file.Files.createTempDirectory("vault_c").toString
    val c = v.compactTo(newRoot, "2024-01-05 00:00:00")

    for (t <- Seq("2024-01-05 00:00:00", "2024-01-08 12:00:00", "2024-01-10 00:00:00")) {
      val want = v.query(t).select("record_id", "data")
        .as[(String, String)].collect().toSet
      val got = c.query(t).select("record_id", "data")
        .as[(String, String)].collect().toSet
      assert(got == want, s"divergence at $t")
    }
    // compacted log prefix holds exactly one version per live record
    assert(c.log.filter($"ts" <= lit("2024-01-05 00:00:00").cast("timestamp"))
      .groupBy("record_id").count().filter($"count" > 1).count() == 0)
    assert(c.rollbackHistory.count() == 1)
  }

  test("snapshot fast path returns the same state as the full-log read") {
    val v = mkVault()
    v.append(batch(
      ("u1", "2024-01-01 00:00:00", 1, "a"),
      ("u2", "2024-01-02 00:00:00", 2, "x")))
    v.writeSnapshot("2024-01-03 00:00:00")
    v.append(batch(
      ("u1", "2024-01-04 00:00:00", 3, "b"),
      ("u4", "2024-01-05 00:00:00", 4, "q")))

    val got = v.query("2024-01-05 12:00:00").select("record_id", "data")
      .as[(String, String)].collect().toSet
    assert(got == Set(("u1", "b"), ("u2", "x"), ("u4", "q")))
    // and before the post-snapshot appends, the snapshot path agrees
    // with a plain log read
    val early = v.query("2024-01-04 12:00:00").select("record_id", "data")
      .as[(String, String)].collect().toSet
    assert(early == Set(("u1", "b"), ("u2", "x")))
  }
}
