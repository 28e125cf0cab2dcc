package graft

import org.apache.spark.sql.functions._
import graft.temporal.Temporal
import graft.functions.Sketch
import graft.operators.Pipeline

/** Hand-derivations for the round-15 coverage keys: t18 vacuum
  * (physical retention reclaim), s6 cross-shard histogram-sketch
  * merge, x29 per-source contamination report. */
class R15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tsl(s: String) = lit(s).cast("timestamp")

  // ---- t18 vacuum -------------------------------------------------------

  private val chain = Seq(
    // key, ts, tie, v — key 1: three pre-cutoff + two post; key 2: pre
    // only; key 3: post only
    (1L, "2024-01-01 00:00:00", 1L, 10.0),
    (1L, "2024-01-03 00:00:00", 2L, 11.0),
    (1L, "2024-01-05 00:00:00", 3L, 12.0), // latest pre -> CARRIER
    (1L, "2024-01-12 00:00:00", 4L, 13.0),
    (1L, "2024-01-15 00:00:00", 5L, 14.0),
    (2L, "2024-01-02 00:00:00", 6L, 20.0),
    (2L, "2024-01-04 00:00:00", 7L, 21.0), // latest pre -> CARRIER
    (3L, "2024-01-11 00:00:00", 8L, 30.0)
  ).toDF("k", "ts_s", "tie", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    .select("k", "ts", "tie", "v")
  private val cutoff = "2024-01-10 00:00:00"

  test("vacuum keeps post-cutoff rows verbatim + the latest pre-cutoff carrier") {
    val out = Temporal.vacuum(chain, "k", "ts", "tie", tsl(cutoff))
      .select(col("k"), col("tie"), col("row_kind"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      (1L, 4L, "LIVE"), (1L, 5L, "LIVE"), (3L, 8L, "LIVE"),
      (1L, 3L, "CARRIER"), (2L, 7L, "CARRIER")))
  }

  test("vacuum preserves every AS-OF read at or after the cutoff") {
    val vac = Temporal.vacuum(chain, "k", "ts", "tie", tsl(cutoff))
      .drop("row_kind")
    for (t <- Seq("2024-01-10 00:00:00", "2024-01-12 00:00:00",
        "2024-01-13 00:00:00", "2024-01-20 00:00:00")) {
      val a = Temporal.asOf(chain, "k", "ts", "tie", tsl(t))
        .collect().map(_.toSeq).toSet
      val b = Temporal.asOf(vac, "k", "ts", "tie", tsl(t))
        .collect().map(_.toSeq).toSet
      assert(a == b, s"asOf($t) diverged after vacuum")
    }
  }

  test("vacuum row counts reconcile with ttlCompaction's plan") {
    val plan = Temporal.ttlCompaction(chain, "k", "ts", tsl(cutoff))
      .agg(sum("retained")).head().getLong(0)
    val physical = Temporal.vacuum(chain, "k", "ts", "tie", tsl(cutoff)).count()
    assert(plan == physical && physical == 5L)
  }

  test("retentionAudit: consistent on correct inputs, flags a corrupted vacuum") {
    val audit = Temporal.retentionAudit(chain, "k", "ts", "tie", tsl(cutoff))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getBoolean(5))).toList
    // plan == actual everywhere: k1 retained 3 (carrier+2 live),
    // k2 retained 1 (carrier), k3 retained 1 (live)
    assert(audit == List((1L, 3L, 3L, true), (2L, 1L, 1L, true),
      (3L, 1L, 1L, true)))
    // a corrupted physical output (k2's only retained row — its
    // carrier — lost entirely) must surface as consistent=false with
    // actual_retained 0, not silently drop out of the audit: the
    // operator's join is LEFT with actual_retained coalesced to 0
    val corrupted = Temporal.vacuum(chain, "k", "ts", "tie", tsl(cutoff))
      .filter(!(col("k") === 2L && col("row_kind") === "CARRIER"))
    val flagged = Temporal.retentionAudit(chain, "k", "ts", "tie",
        tsl(cutoff), actualRows = Some(corrupted))
      .filter(!col("consistent"))
      .collect().map(r => (r.getLong(0), r.getLong(4))).toList
    assert(flagged == List((2L, 0L)))
  }

  // ---- s6 histogram-sketch merge ----------------------------------------

  private val vals = Seq(
    ("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
    ("b", 4.0), ("b", 5.0), ("b", 6.0), ("b", 7.0),
    ("c", 8.0), ("c", 9.0), ("c", 10.0), ("c", 16.0)
  ).toDF("shard", "v")

  test("merged shard sketches equal the flat single-pass histogram") {
    val mm = vals.agg(min(col("v")).as("gmin"), max(col("v")).as("gmax"))
    val merged = Sketch.histShardSketches(vals, "shard", "v", mm, 16)
      .groupBy("__b").agg(sum("__c").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val flat = Sketch.histShardSketches(
        vals.withColumn("shard", lit("all")), "shard", "v", mm, 16)
      .select(col("__b"), col("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(merged == flat)
    // any merge order: sum over a different shard split is identical
    val resplit = Sketch.histShardSketches(
        vals.withColumn("shard", (col("v") % 2).cast("int").cast("string")),
        "shard", "v", mm, 16)
      .groupBy("__b").agg(sum("__c").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(resplit == flat)
  }

  test("histMergedQuantiles: hand-derived estimates on a 12-value frame") {
    // range [0,16], 16 buckets of width 1; v=16 clamps to bucket 15.
    // cum at bucket b (one value per bucket 0..10, then 15):
    // p50: ceil(.5*12)=6 -> first cum>=6 is bucket 5 -> est (5+1)*1=6
    // p90: ceil(.9*12)=11 -> bucket 10 -> est 11
    // p99: ceil(.99*12)=12 -> bucket 15 -> est 16
    val out = Sketch.histMergedQuantiles(vals, "shard", "v", 16).head()
    assert(out.getLong(0) == 12L && out.getLong(1) == 3L)
    assert(out.getDouble(2) == 6.0 && out.getDouble(3) == 11.0 &&
      out.getDouble(4) == 16.0)
  }

  // ---- x29 contamination report -----------------------------------------

  test("contaminationReport: hand-derived per-source rollup") {
    val docs = Seq(
      // doc 0 is bench (id % 20 == 0); docs 1-2 share its 3 shingles
      (0L, "src_a", "w1 w2 w3 w4 w5"),
      (1L, "src_a", "w1 w2 w3 w4 w5"),          // contaminated, 5 toks
      (2L, "src_b", "x w1 w2 w3 w4 w5"),        // contaminated, 6 toks
      (3L, "src_b", "q r s t u v"),             // clean, 6 toks
      (4L, "src_c", "a b c")                    // clean, 3 toks
    ).toDF("doc_id", "source", "text")
    val bench = pmod(col("doc_id"), lit(20)) === 0
    val hits = Pipeline.decontaminate(docs, "doc_id", "text", 3, bench, 3)
    val out = Pipeline.contaminationReport(
        docs, "doc_id", "text", "source", bench, hits)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    assert(out == List(
      ("src_a", 1L, 1L, 5L, 5L, 1.0),
      ("src_b", 2L, 1L, 12L, 6L, 0.5),
      ("src_c", 1L, 0L, 3L, 0L, 0.0)))
  }
}
