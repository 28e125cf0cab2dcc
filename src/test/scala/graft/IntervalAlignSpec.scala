package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.temporal.Temporal
import graft.operators.Pipeline
import graft.multimodal.Binary
import graft.sources.Tables

/** t15 intervalAlign (window-sweep temporal alignment), m7 shardPack
  * (byte-budget shard manifest) and x18 corpusCard (CUBE dataset card).
  * The alignment sweep is cross-checked against an independently built
  * pairwise scd2 x scd2 overlap join — the same derivation the DuckDB
  * oracle uses — on both a hand corpus with the edge cases and the
  * driver testdata. */
class IntervalAlignSpec extends SparkSpec {
  import spark.implicits._

  private def evDf(rows: Seq[(Long, String, Long, String, Double)]): DataFrame =
    rows.toDF("user_id", "tss", "event_id", "event_type", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")

  /** The quadratic pairwise formulation (scd2 ⋈ scd2 on interval
    * overlap) — deliberately a different derivation than the sweep. */
  private def pairwise(df: DataFrame): DataFrame = {
    val inf = Long.MaxValue
    def chain(t: String, p: String) =
      Temporal.scd2(df.filter(col("event_type") === t), "user_id", "ts", "event_id")
        .select(col("user_id"),
          col("version").as(s"${p}_version"), col("value").as(s"${p}_value"),
          unix_micros(col("ts")).as(s"${p}_from"),
          unix_micros(col("valid_to")).as(s"${p}_to"))
    val a = chain("click", "a")
    val b = chain("view", "b").withColumnRenamed("user_id", "user_id_b")
    a.join(b, col("user_id") === col("user_id_b") &&
        greatest(col("a_from"), col("b_from")) <
          least(coalesce(col("a_to"), lit(inf)), coalesce(col("b_to"), lit(inf))))
      .select(col("user_id"),
        greatest(col("a_from"), col("b_from")).as("iv_from_us"),
        nullif(least(coalesce(col("a_to"), lit(inf)), coalesce(col("b_to"), lit(inf))),
          lit(inf)).as("iv_to_us"),
        col("a_version"), col("a_value"), col("b_version"), col("b_value"))
  }

  private def collectAlign(df: DataFrame): List[(Long, Long, Option[Long], Long, Double, Long, Double)] =
    df.select("user_id", "iv_from_us", "iv_to_us", "a_version", "a_value", "b_version", "b_value")
      .as[(Long, Long, Option[Long], Long, Double, Long, Double)]
      .collect().toList.sorted

  private def sweep(df: DataFrame): DataFrame =
    Temporal.intervalAlign(df, "user_id", "ts", "event_id",
      col("event_type") === "click", col("event_type") === "view", "value")

  test("intervalAlign: hand corpus — open tails, pre-chain exclusion, zero-length tie dropped") {
    val df = evDf(Seq(
      // user 1: click@10 v=1.0, view@20 v=2.0, click@30 v=3.0 → two segments
      (1L, "2024-01-01 00:00:10", 1L, "click", 1.0),
      (1L, "2024-01-01 00:00:20", 2L, "view", 2.0),
      (1L, "2024-01-01 00:00:30", 3L, "click", 3.0),
      // user 2: only clicks → nothing aligns
      (2L, "2024-01-01 00:00:10", 4L, "click", 9.0),
      // user 3: click and view at the SAME ts → zero-length boundary
      // segment dropped, the joint open tail survives
      (3L, "2024-01-01 00:00:40", 5L, "click", 4.0),
      (3L, "2024-01-01 00:00:40", 6L, "view", 5.0),
      // other event types must be ignored entirely
      (1L, "2024-01-01 00:00:15", 7L, "error", 99.0)))
    val got = collectAlign(sweep(df))
    // 2024-01-01 00:00:00 UTC + s seconds, in micros
    def us(s: Long) = (1704067200L + s) * 1000000L
    assert(got == List(
      (1L, us(20), Some(us(30)), 1L, 1.0, 1L, 2.0),
      (1L, us(30), None, 2L, 3.0, 1L, 2.0),
      (3L, us(40), None, 1L, 4.0, 1L, 5.0)).sorted)
    // the different derivation agrees
    assert(got == collectAlign(pairwise(df)))
  }

  test("intervalAlign: sweep == pairwise scd2 overlap join on driver testdata") {
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type", "value")
    assert(collectAlign(sweep(ev)) == collectAlign(pairwise(ev)))
  }

  test("stateDurations: hand-computed dwell times, open tails excluded") {
    val df = evDf(Seq(
      // user 1: click 10s→20s (10s in click), view 20s→50s (30s in view),
      //         click 50s→(open, excluded)
      (1L, "2024-01-01 00:00:10", 1L, "click", 0.0),
      (1L, "2024-01-01 00:00:20", 2L, "view", 0.0),
      (1L, "2024-01-01 00:00:50", 3L, "click", 0.0),
      // user 2: single event → only an open tail, contributes nothing
      (2L, "2024-01-01 00:00:00", 4L, "view", 0.0)))
    val out = Temporal.stateDurations(df, "user_id", "ts", "event_id", "event_type")
      .as[(String, Long, Long, Double, Double)].collect().toList
    assert(out == List(
      ("click", 1L, 10000000L, 10000000.0, 0.25),
      ("view", 1L, 30000000L, 30000000.0, 0.75)))
  }

  test("shardPack: byte budgets, oversize advances budget, totals conserved (hashShards=1)") {
    // hashShards=1 collapses the md5 decomposition to a single sub-shard
    // per source, so the hand-checked cumulative budget math applies
    // directly (the stitch offset is 0 everywhere)
    val docs = Seq(
      (1L, "aaaa", "s1"), // 4 B → shard 0 (cum_before 0)
      (2L, "bbbbbbbb", "s1"), // 8 B → shard 0 (cum 4)
      (3L, "cccccccccccccccccccc", "s1"), // 20 B oversize → shard 1 (cum 12)
      (4L, "dd", "s1"), // cum 32 → shard 3: oversize blob advanced the budget
      (5L, "ee", "s2") // separate source restarts at shard 0
    ).toDF("doc_id", "text", "source").withColumn("n_chars", length(col("text")))
    val out = Binary.shardPack(docs, "doc_id", "text", "source", 10, hashShards = 1)
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      ("s1", 0L, 2L, 12L, 1L), ("s1", 1L, 1L, 20L, 3L), ("s1", 3L, 1L, 2L, 4L),
      ("s2", 0L, 1L, 2L, 5L)))
    // conservation: shard bytes sum to corpus bytes
    assert(out.map(_._4).sum == 4 + 8 + 20 + 2 + 2)
  }

  test("shardPack: oversize blob arriving mid-shard does NOT claim an exclusive shard") {
    // doc 1 (4 B) opens bin 0; the 20 B oversize doc 2 lands at cum 4 —
    // still bin 0, SHARING the shard with doc 1 (what a streaming tar
    // writer produces when an oversize sample arrives mid-shard); doc 3
    // at cum 24 skips the budget-exhausted ids 1 and lands in bin 2
    val docs = Seq(
      (1L, "aaaa", "s1"),
      (2L, "cccccccccccccccccccc", "s1"),
      (3L, "dd", "s1")
    ).toDF("doc_id", "text", "source")
    val out = Binary.shardPack(docs, "doc_id", "text", "source", 10, hashShards = 1)
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(out == List(("s1", 0L, 2L, 24L, 1L), ("s1", 2L, 1L, 2L, 3L)))
  }

  test("shardPack: md5 sub-shard stitch — global ids contiguous per source, totals conserved") {
    // default hashShards=8 deals the 4 s1 docs into 4 distinct md5
    // sub-shards (ids 1..4 → hshards 0,6,7,1); each packs its single
    // blob into local bin 0 and the running-offset stitch assigns
    // global shards 0..3 in hshard order: doc1(h0)→0, doc4(h1)→1,
    // doc2(h6)→2, doc3(h7)→3
    val docs = Seq(
      (1L, "aaaa", "s1"), (2L, "bbbbbbbb", "s1"),
      (3L, "cccccccccccccccccccc", "s1"), (4L, "dd", "s1"),
      (5L, "ee", "s2")
    ).toDF("doc_id", "text", "source")
    val out = Binary.shardPack(docs, "doc_id", "text", "source", 10)
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      ("s1", 0L, 1L, 4L, 1L), ("s1", 1L, 1L, 2L, 4L), ("s1", 2L, 1L, 8L, 2L),
      ("s1", 3L, 1L, 20L, 3L), ("s2", 0L, 1L, 2L, 5L)))
    // stitch invariants: per-source shard ids are 0..n-1 with no gaps
    // BETWEEN sub-shards (gaps inside one sub-shard's budget run are
    // legal), and byte totals are conserved across the decomposition
    assert(out.map(_._4).sum == 4 + 8 + 20 + 2 + 2)
    val oneShardOut = Binary.shardPack(docs, "doc_id", "text", "source", 10, hashShards = 1)
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(out.map(_._4).sum == oneShardOut.map(_._4).sum)
  }

  test("corpusCard: CUBE granularities consistent, hand-checked groups") {
    val docs = Seq(
      (1L, "a b", "en", "s1"), (2L, "c", "en", "s1"),
      (3L, "d e f", "fr", "s1"), (4L, "g h", "en", "s2")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Pipeline.corpusCard(docs, "source", "lang", "text", "n_chars")
      .as[(Long, String, String, Long, Long, Long, Double)].collect().toList
    val byKey = out.map(r => (r._1, r._2, r._3) -> r).toMap
    // finest: (s1, en) = docs 1,2 → 2 docs, 4 chars, 3 tokens
    assert(byKey((0L, "s1", "en"))._4 == 2L && byKey((0L, "s1", "en"))._6 == 3L)
    // lang-rollup: (s1, ALL) = 3 docs; source-rollup: (ALL, en) = 3 docs
    assert(byKey((1L, "s1", "ALL"))._4 == 3L)
    assert(byKey((2L, "ALL", "en"))._4 == 3L)
    // grand total row sums everything
    val g = byKey((3L, "ALL", "ALL"))
    assert(g._4 == 4L && g._5 == out.filter(_._1 == 0L).map(_._5).sum)
    // every granularity's doc counts sum to the corpus
    for (grp <- 0L to 3L)
      assert(out.filter(_._1 == grp).map(_._4).sum == 4L, s"grp $grp")
  }

  test("corpusCard: data-level NULL lang/source become 'und'/'unknown', never 'ALL'") {
    val docs = Seq(
      (1L, "a b", "en", "s1"),
      (2L, "x y z", null.asInstanceOf[String], "s1"), // lang unknown
      (3L, "p q", "en", null.asInstanceOf[String])    // source unknown
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Pipeline.corpusCard(docs, "source", "lang", "text", "n_chars")
      .as[(Long, String, String, Long, Long, Long, Double)].collect().toList
    val byKey = out.map(r => (r._1, r._2, r._3) -> r).toMap
    // the NULL-lang doc surfaces at the FINEST granularity under 'und'
    assert(byKey((0L, "s1", "und"))._4 == 1L)
    assert(byKey((0L, "unknown", "en"))._4 == 1L)
    // no finest-granularity row carries the rollup label
    assert(!out.exists(r => r._1 == 0L && (r._2 == "ALL" || r._3 == "ALL")))
    // rollups still total the whole corpus (the coalesced docs count)
    assert(byKey((3L, "ALL", "ALL"))._4 == 3L)
    assert(byKey((2L, "ALL", "en"))._4 == 2L)
    assert(byKey((2L, "ALL", "und"))._4 == 1L)
  }
}
