package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Binary

/** Round-17 pins: m5 phash hot-bucket sub-block sharding is
  * semantics-preserving (identical pair set hot, cold and mixed). */
class R17OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- m5 hot-bucket sharding --------------------------------------------

  // synthetic fingerprint table with a PLANTED hot bucket: 30 of 50 docs
  // share c0 = 0 (the degenerate flat-frame chunk) while c1..c3 vary;
  // the rest are spread. Deterministic arithmetic, no RNG.
  private def plantedFp = (0L until 50L).map { i =>
    val hot = i < 30
    (i,
      if (hot) 0L else (i * 7919L) % 65536L,
      (i * 104729L) % 65536L,
      (i * 1299709L) % 65536L,
      (i * 15485863L) % 65536L)
  }.toDF("doc_id", "c0", "c1", "c2", "c3")

  private def pairSet(hotThreshold: Int, subBlocks: Int = 4): Set[(Long, Long, Long)] =
    Binary.phashCandidates(plantedFp, "doc_id", hotThreshold, subBlocks)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("phashCandidates: sub-block sharding preserves the exact pair set") {
    val unsharded = pairSet(Int.MaxValue)
    // planted bucket (30 rows) crosses a threshold of 10 -> hot arm fires
    assert(pairSet(10) === unsharded)
    // every bucket forced hot -> still the same set
    assert(pairSet(0) === unsharded)
    // and the hot arm really does find the planted bucket's pairs: all
    // 30×29/2 c0-bucket pairs are candidates
    val hotIds = (0L until 30L).toSet
    val inHot = unsharded.count { case (a, b, _) => hotIds(a) && hotIds(b) }
    assert(inHot === 30 * 29 / 2)
  }

  test("phashCandidates: sub-block count does not change results") {
    val base = pairSet(10, subBlocks = 4)
    assert(pairSet(10, subBlocks = 2) === base)
    assert(pairSet(10, subBlocks = 8) === base)
  }

  // ---- quantile trio via the shared selection memo -----------------------

  test("QuantileCache.percentiles == TimeSeries.percentiles (direct)") {
    val direct = graft.operators.TimeSeries.percentiles(
        graft.sources.Tables.events(spark, sfDir), "event_type", "value")
      .collect().map(_.toSeq).toSet
    val memo = graft.operators.QuantileCache.percentiles(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(memo === direct)
  }

  test("QuantileCache.madOutliers == TimeSeries.madOutliers (direct)") {
    val direct = graft.operators.TimeSeries.madOutliers(
        graft.sources.Tables.events(spark, sfDir), "event_type", "value", 3)
      .collect().map(_.toSeq).toSet
    val memo = graft.operators.QuantileCache.madOutliers(spark, sfDir, 3)
      .collect().map(_.toSeq).toSet
    assert(memo === direct)
  }

  test("histQuantiles with QuantileCache exact legs == direct build") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_type", "value")
    val direct = graft.functions.Sketch
      .histQuantiles(ev, "event_type", "value", buckets = 256)
      .collect().map(_.toSeq).toSet
    val memo = graft.functions.Sketch.histQuantiles(
        graft.operators.QuantileCache.projection(spark, sfDir)
          .select(col("__g").as("event_type"), col("__v").as("value")),
        "event_type", "value", buckets = 256,
        exactLegs = Some(graft.operators.QuantileCache.exactLegs(spark, sfDir)))
      .collect().map(_.toSeq).toSet
    assert(memo === direct)
  }

  // ---- vault per-op metrics (the reference's /metrics counters) ----------

  test("TemporalVault ops move the per-endpoint counters and histogram") {
    val root = java.nio.file.Files.createTempDirectory("vault_metrics").toString
    val v = new graft.temporal.TemporalVault(spark, root)
    def c(op: String) = Metrics.count(op)
    val (a0, q0, h0, r0) = (c("vault.append"), c("vault.query"),
      c("vault.history"), c("vault.rollback"))
    val batch = Seq(
      ("alice", "2024-01-01 09:00:00", 1L, "v1"),
      ("alice", "2024-01-10 09:00:00", 2L, "v2"))
      .toDF("record_id", "ts_s", "seq", "data")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .select("record_id", "ts", "seq", "data")
    v.append(batch)
    v.query("2024-01-05 00:00:00").collect()
    v.history("alice").collect()
    v.rollback("2024-01-05 00:00:00", "2024-01-15 00:00:00").collect()
    assert(c("vault.append") === a0 + 1)
    assert(c("vault.query") === q0 + 1)
    assert(c("vault.history") === h0 + 1)
    assert(c("vault.rollback") === r0 + 1)
    // histogram: cumulative, final +Inf bucket equals the count
    val hist = Metrics.histogram("vault.append")
    assert(hist.last._1.isPosInfinity && hist.last._2 === c("vault.append"))
    // append is eager (log write + min-ts probe): its inner SQL
    // executions are attributed to the .sql label, not the endpoint
    assert(Metrics.count("vault.append.sql") >= 1L)
    assert(Metrics.totalSeconds("vault.append") > 0.0)
  }

  // ---- sketch merge on empty input (ADVICE r16) --------------------------

  test("kmv/hll merged distinct on empty input: zz_union row, NULL rel_err") {
    val empty = Seq.empty[(String, Long)].toDF("event_type", "user_id")
    val kmv = graft.functions.Sketch
      .kmvMergedDistinct(empty, "event_type", col("user_id"), k = 4).collect()
    assert(kmv.length === 1 && kmv(0).getString(0) === "zz_union")
    assert(kmv(0).getLong(kmv(0).fieldIndex("exact_distinct")) === 0L)
    assert(kmv(0).isNullAt(kmv(0).fieldIndex("rel_err")),
      "0/0 must surface as NULL, not NaN")
    val hll = graft.functions.Sketch
      .hllMergedDistinct(empty, "event_type", col("user_id")).collect()
    // an empty register table yields no per-shard rows and no union row
    // OR a guarded union row — either way no NaN may appear
    hll.foreach(r => assert(r.isNullAt(r.fieldIndex("rel_err")) ||
      !r.getDouble(r.fieldIndex("rel_err")).isNaN))
  }

  test("perceptualHashIndex is unchanged by forced sharding") {
    // end-to-end through the real text path: the m5 report must be
    // bit-identical whether its candidate join sharded or not
    val docs = (1L to 30L).map(i =>
      (i, (1 to 80).map(j => ('a' + (i * 31 + j * 7) % 26).toChar).mkString))
      .toDF("doc_id", "text")
    val out = Binary.perceptualHashIndex(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    // the default threshold (1024) never fires at 30 docs, so `out` is
    // the unsharded report; compare the candidate core under forced
    // sharding instead
    val ph = Binary.perceptualHash(docs, "doc_id", "text")
    val sharded = Binary.phashCandidates(ph, "doc_id", 0, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Binary.phashCandidates(ph, "doc_id", Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sharded === plain)
    assert(out.nonEmpty)
  }
}
