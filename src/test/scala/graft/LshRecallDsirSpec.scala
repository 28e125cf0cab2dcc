package graft

import org.apache.spark.sql.functions._
import graft.dedup.{ClusterCache, Dedup}
import graft.operators.Pipeline

/** d11 (LSH recall bands) + x25 (DSIR importance weights):
  * hand-derivable planted corpora + cross-derivation invariants on the
  * real corpus. */
class LshRecallDsirSpec extends SparkSpec {
  import spark.implicits._

  test("d11: exact duplicates are always candidates; precision row ties out") {
    // 10 exact-dup pairs (identical text -> identical minhash signature
    // in EVERY band -> guaranteed candidates; J = 1.0 -> band 3) next
    // to 20 unrelated docs
    val docs = (0 until 10).flatMap { i =>
      val t = s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i"
      Seq((i * 2L, t), (i * 2L + 1, t))
    } ++ (100 until 120).map(i =>
      (i.toLong, s"solo$i unique$i text$i nothing$i shared$i here$i now$i"))
    val df = docs.toDF("doc_id", "text")
    val cand = Dedup.minhashLshPairs(df, "doc_id", "text", 3, 16, 4)
    val truth = Dedup.ngramJaccardPairsFrom(
      Dedup.shinglePostings(df, "doc_id", "text", 3), 0.12)
    val out = Dedup.lshRecallBands(cand, truth).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // band 3 holds the 10 identical pairs, all found
    assert(out(3)._1 == 10 && out(3)._2 == 10 && out(3)._3 == 1.0)
    // precision-row hit count == sum of per-band hit counts (same set)
    val bandHits = out.filterKeys(_ >= 0).values.map(_._2).sum
    assert(out(-1)._2 == bandHits)
    // recall never exceeds 1, hits never exceed truth
    out.values.foreach { case (t, h, r) => assert(h <= t && r <= 1.0) }
  }

  test("d11 on the real corpus: consumes the shared tables, s-curve direction") {
    val out = SparkEntry.queries("d11_lsh_recall")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.contains(-1)) // precision row always present
    val bands = out.filterKeys(_ >= 0)
    assert(bands.nonEmpty)
    bands.values.foreach { case (t, h, _) => assert(h <= t) }
    // the s-curve: the TOP band present must recall at least as well
    // as the bottom band present (1 - (1-s^r)^b rises with s)
    if (bands.size >= 2) {
      val lo = bands(bands.keys.min)._3
      val hi = bands(bands.keys.max)._3
      assert(hi >= lo, s"inverted s-curve: band recalls $bands")
    }
  }

  test("x25: target-aligned docs are selected, target-foreign are not") {
    // target = lang 'en'. Build a corpus where sources split cleanly:
    // srcA docs reuse the target vocabulary, srcB docs are disjoint.
    // the selection bar is the CORPUS-AVERAGE gap, so the foreign mass
    // must dominate the pool for the target-like minority to clear it
    // (DSIR's usual regime: a small curated target inside a large raw
    // crawl)
    val tgt = (0 until 10).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog", "en", "srcT"))
    val like = (100 until 110).map(i =>
      (i.toLong, "quick brown fox jumps over lazy dog", "de", "srcA"))
    // srcB shares a COMMON foreign vocabulary (a real language's
    // shape): the add-one hashed LM discriminates on common-mass
    // features — tgt 0 vs raw 40 is bits 1 vs 6 — where per-doc-unique
    // junk would be bits 1 vs 2 (smoothing-dominated, barely penalized)
    val unlike = (200 until 240).map(i =>
      (i.toLong, "zzz qqq vvv kkk xxx www yyy", "zh", "srcB"))
    val df = (tgt ++ like ++ unlike).toDF("doc_id", "text", "lang", "source")
    val out = Pipeline.dsirWeights(df, "doc_id", "text", "source",
        col("lang") === "en").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4), r.getDouble(6))).toMap
    // target-vocabulary source: every doc beats the corpus-average gap
    assert(out("srcA")._2 == 10, s"srcA selected ${out("srcA")._2}")
    // disjoint-vocabulary source: nothing selected
    assert(out("srcB")._2 == 0, s"srcB selected ${out("srcB")._2}")
    // gap ordering: target-like source sits ABOVE the foreign one
    assert(out("srcA")._3 > out("srcB")._3)
    // gap is never positive (raw counts dominate target counts)
    out.values.foreach { case (_, _, g) => assert(g <= 0.0) }
  }

  test("x25 on the real corpus: totals tie out, en sources lean selected") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = SparkEntry.queries("x25_dsir_weights")(spark, sfDir)
    val rows = out.collect()
    assert(rows.map(_.getLong(1)).sum == docs.count())
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1)) // n_selected <= n_docs
      assert(r.getLong(3) <= 0L)           // gap_bits <= 0
    }
    // selected docs exist and skew target-like: the corpus-average
    // rule selects a strict, non-empty subset
    val nSel = rows.map(_.getLong(4)).sum
    assert(nSel > 0 && nSel < docs.count())
  }
}
