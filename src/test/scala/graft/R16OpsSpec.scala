package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketch
import graft.operators.Pipeline

/** Hand-derivations for the round-16 coverage keys: x30 per-source
  * quality drift over ingest weeks, s7 cross-shard KMV union merge. */
class R16OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- x30 quality drift -------------------------------------------------

  // two sources, two docs each, quality hand-derived from the x2
  // formula. Words chosen so every ratio is exact in 6 dp:
  //   d0 "the a the a": n_words 4, n_distinct 2, stop 4, chars 11
  //     q = .4*min(2/4*2,1) + .3*min(4/4*5,1) + .3*min((11/4)/8,1)
  //       = .4*1 + .3*1 + .3*0.34375 = 0.803125 -> round6 0.803125
  //   d1 "x y z w":        n_words 4, n_distinct 4, stop 0, chars 7
  //     q = .4*1 + 0 + .3*((7/4)/8 = 0.21875) = 0.465625
  //   d2 "the the the the": n_words 4, n_distinct 1, stop 4, chars 15
  //     q = .4*min(.5,1)=.2 + .3 + .3*min(15/32,1)=0.140625 -> 0.640625
  //   d3 "a b":             n_words 2, n_distinct 2, stop 1, chars 3
  //     q = .4 + .3*min(.5*5,1)=.3 + .3*min((1.5)/8,1)=0.05625 -> 0.75625
  private val docs = Seq(
    (0L, "the a the a", "s1", 11L),
    (1L, "x y z w", "s1", 7L),
    (2L, "the the the the", "s2", 15L),
    (3L, "a b", "s2", 3L)
  ).toDF("doc_id", "text", "source", "n_chars")

  // 6 events over two ISO weeks (2024-01-01 and 2024-01-08 are both
  // Mondays); doc_id = event_id % 4
  private val events = Seq(
    (0L, "2024-01-01 10:00:00"), // wk1 -> d0 (s1)
    (1L, "2024-01-02 10:00:00"), // wk1 -> d1 (s1)
    (2L, "2024-01-03 10:00:00"), // wk1 -> d2 (s2)
    (5L, "2024-01-09 10:00:00"), // wk2 -> d1 (s1)
    (6L, "2024-01-10 10:00:00"), // wk2 -> d2 (s2)
    (7L, "2024-01-11 10:00:00")  // wk2 -> d3 (s2)
  ).toDF("event_id", "ts_s")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  private def quality(df: org.apache.spark.sql.DataFrame) = {
    val ws = graft.functions.Text.words(col("text"))
    df.select(col("doc_id"), col("source"),
      graft.functions.Text.qualityScore(size(ws), size(array_distinct(ws)),
        graft.functions.Text.stopwordHits(ws, Seq("the", "a")),
        col("n_chars")).as("quality"))
  }

  test("qualityDrift: hand-derived weekly means, baseline and drift flag") {
    val out = Pipeline.qualityDrift(quality(docs), "doc_id", "source",
        "quality", events, "event_id", "ts", 4L, threshMicro = 20000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getBoolean(6)))
      .toList
    // s1 wk1: (d0 .803125 + d1 .465625)/2 = 0.634375; wk2: d1 .465625
    //   drift = .465625 - .634375 = -0.16875 -> -168750 micro, drifted
    // s2 wk1: d2 .640625; wk2: (d2 .640625 + d3 .75625)/2 = 0.6984375
    //   -> round6 0.698438 (round half up); drift micro = 57813
    assert(out == List(
      ("s1", "2024-01-01", 2L, 0.634375, 0.634375, 0L, false),
      ("s1", "2024-01-08", 1L, 0.465625, 0.634375, -168750L, true),
      ("s2", "2024-01-01", 1L, 0.640625, 0.640625, 0L, false),
      ("s2", "2024-01-08", 2L, 0.698438, 0.640625, 57813L, true)))
  }

  test("qualityDrift: a single-week source reads drift 0, not drifted") {
    val ev1 = events.filter(col("event_id") < 3) // week 1 only
    val out = Pipeline.qualityDrift(quality(docs), "doc_id", "source",
        "quality", ev1, "event_id", "ts", 4L, threshMicro = 20000L)
      .collect().map(r => (r.getString(0), r.getLong(5), r.getBoolean(6)))
      .toList
    assert(out == List(("s1", 0L, false), ("s2", 0L, false)))
  }

  // ---- s7 KMV union merge -------------------------------------------------

  private val stream = Seq(
    // (shard, key): A has 4 distinct keys, B has 3; |A ∪ B| = 5
    ("A", "u1"), ("A", "u2"), ("A", "u3"), ("A", "u4"), ("A", "u1"),
    ("B", "u3"), ("B", "u4"), ("B", "u5"), ("B", "u5")
  ).toDF("g", "k")

  test("kmvMergedDistinct: unsaturated sketches read est == exact everywhere") {
    // k = 8 > any cohort: theta = 2^60, est = |sample| = exact
    val out = Sketch.kmvMergedDistinct(stream, "g", col("k"), k = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(out == List(("A", 4.0, 4L, 0.0), ("B", 3.0, 3L, 0.0),
      ("zz_union", 5.0, 5L, 0.0)))
  }

  test("kmvMergedDistinct: union leg equals the flat single-stream sketch " +
      "when shards are unsaturated") {
    // shards unsaturated at k=4 (max cohort 4 distinct => theta 2^60
    // only when size < k; A is exactly at k — saturate it on purpose
    // with k=3 instead, so the property is exercised on a SATURATED
    // union: merged sample = union of bottom-3s, and since every
    // distinct hash of a 3-or-4 element cohort is in its bottom-4...
    // keep it simple: k=4 keeps B unsaturated and A exactly full; the
    // merged sample then contains ALL 5 distinct hashes, so the union
    // leg must equal a flat (single-shard) sketch of the whole stream
    val flat = Sketch.kmvMergedDistinct(
        stream.withColumn("g", lit("all")), "g", col("k"), k = 4)
      .filter(col("cohort") === "all")
      .collect().map(r => (r.getDouble(1), r.getLong(2))).head
    val union = Sketch.kmvMergedDistinct(stream, "g", col("k"), k = 4)
      .filter(col("cohort") === "zz_union")
      .collect().map(r => (r.getDouble(1), r.getLong(2))).head
    assert(union == flat)
  }

  // ---- x31 duplicate-serving drift ---------------------------------------

  test("dupServingDrift: hand-derived dup counts; unique corpus reads zero") {
    // d1 and d3 share a fingerprint (same normalized text); canonical
    // is the min id (1), so doc 3 is the only dup
    val dd = Seq(
      (0L, "alpha beta", "s1"),
      (1L, "Dup text!", "s1"),
      (2L, "gamma", "s2"),
      (3L, "dup TEXT", "s2") // normalizes equal to doc 1 -> dup
    ).toDF("doc_id", "text", "source")
    // wk1 serves docs 0,1,2; wk2 serves 3 (event 7 % 4) and 1 (event 5)
    val out = Pipeline.dupServingDrift(dd, "doc_id", "text", "source",
        events, "event_id", "ts", 4L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toList
    // events: wk1 e0->d0(s1), e1->d1(s1), e2->d2(s2);
    //         wk2 e5->d1(s1), e6->d2(s2), e7->d3(s2 dup)
    assert(out == List(
      ("s1", "2024-01-01", 2L, 0L, 0.0),
      ("s1", "2024-01-08", 1L, 0L, 0.0),
      ("s2", "2024-01-01", 1L, 0L, 0.0),
      ("s2", "2024-01-08", 2L, 1L, 0.5)))
    val unique = Pipeline.dupServingDrift(docs, "doc_id", "text", "source",
        events, "event_id", "ts", 4L)
      .agg(sum(col("dup_served"))).head().getLong(0)
    assert(unique == 0L)
  }

  // ---- s8 HLL union merge -------------------------------------------------

  test("hllMergedDistinct: union row equals the flat single-stream build") {
    // max-merge of per-shard registers must be IDENTICAL to the
    // registers of the flat stream — so the union estimate equals a
    // single-shard build over everything, for any p
    for (p <- Seq(2, 4)) {
      val flat = Sketch.hllMergedDistinct(
          stream.withColumn("g", lit("all")), "g", col("k"), p)
        .filter(col("cohort") === "all")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).head
      val union = Sketch.hllMergedDistinct(stream, "g", col("k"), p)
        .filter(col("cohort") === "zz_union")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).head
      assert(union == flat, s"p=$p")
    }
  }

  test("hllMergedDistinct: shard-split invariance + exact columns") {
    val byParity = stream.withColumn("g",
      concat(lit("par"), (length(col("k")) % 2).cast("string")))
    def unionRow(df: org.apache.spark.sql.DataFrame) =
      Sketch.hllMergedDistinct(df, "g", col("k"), 4)
        .filter(col("cohort") === "zz_union")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).head
    assert(unionRow(stream) == unionRow(byParity))
    // exact side: per-shard and union exact counts are the true ones
    val rows = Sketch.hllMergedDistinct(stream, "g", col("k"), 4)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(rows == Map("A" -> 4L, "B" -> 3L, "zz_union" -> 5L))
  }

  test("kmvMergedDistinct: shard-split invariance (mergeability)") {
    // the SAME stream split two different ways must produce the SAME
    // union row — the associative/commutative set-union-truncate merge
    val byLen = stream.withColumn("g",
      concat(lit("len"), length(col("k")).cast("string")))
    def unionRow(df: org.apache.spark.sql.DataFrame, k: Int) =
      Sketch.kmvMergedDistinct(df, "g", col("k"), k)
        .filter(col("cohort") === "zz_union")
        .collect().map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3)))
        .head
    for (k <- Seq(2, 3, 8))
      assert(unionRow(stream, k) == unionRow(byLen, k), s"k=$k")
  }
}
