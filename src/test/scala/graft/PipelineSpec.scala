package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.sources.Tables

/** Round-4 training-data pipeline operators: sequence packing,
  * survivorship dedup, benchmark decontamination. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences conserves documents and packs contiguous bins per shard") {
    val docs = Tables.documents(spark, sfDir)
    val packed = Pipeline.packSequences(docs, "doc_id", "text", 512, 8)
      .select($"shard", $"bin", $"n_docs", $"total_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.map(_._3).sum == docs.count())
    // bins are a contiguous 0..max range within each shard
    packed.groupBy(_._1).foreach { case (_, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids.head == 0L && ids.sameElements(0L until ids.length.toLong))
    }
    // deterministic: identical on recomputation
    val again = Pipeline.packSequences(docs, "doc_id", "text", 512, 8)
      .select($"shard", $"bin", $"n_docs", $"total_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.toSet == again.toSet)
  }

  test("packSequences: a bin never starts past the budget boundary mid-document") {
    // cum_before of a bin's first doc is < (bin+1) * budget by
    // construction; equivalently every bin holds >= 1 doc and bins are
    // dense — the overflow case is a single over-budget doc owning its bin
    val docs = Seq((1L, "a " * 600), (2L, "b " * 10), (3L, "c " * 10))
      .toDF("doc_id", "text")
    val packed = Pipeline.packSequences(docs, "doc_id", "text", 512, 1)
      .select($"bin", $"n_docs", $"total_tokens").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // doc 1 (600 tokens) overflows bin 0 alone; docs 2+3 land in bin 1
    assert(packed.length == 2)
    assert(packed(0) == ((0L, 1L, 601L)) || packed(0)._2 == 1L)
  }

  test("ClusterCache shared path matches the direct d2/d6/d7 computations") {
    val docs = Tables.documents(spark, sfDir)
    val directPairs = graft.dedup.Dedup
      .minhashLshPairs(docs, "doc_id", "text", 3, 16, 4)
      .as[(Long, Long)].collect().toSet
    val cachedPairs = graft.dedup.ClusterCache.minhashPairs(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    assert(cachedPairs == directPairs)
    val direct = graft.dedup.Dedup
      .dupClusters(docs, "doc_id", "text", 3, 16, 4)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toSet
    val cached = graft.dedup.ClusterCache.documents(spark, sfDir)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toSet
    assert(cached == direct)
    val directSurv = Pipeline
      .dedupSurvivors(docs, "doc_id", "text", "n_chars", 3, 16, 4)
      .select($"cluster_id", $"survivor_id", $"n_members", $"saved_chars")
      .as[(Long, Long, Long, Long)].collect().toSet
    val sharedSurv = Pipeline
      .dedupSurvivorsFrom(graft.dedup.ClusterCache.documents(spark, sfDir),
        docs, "doc_id", "n_chars")
      .select($"cluster_id", $"survivor_id", $"n_members", $"saved_chars")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sharedSurv == directSurv)
    graft.dedup.ClusterCache.clear()
  }

  test("dedupSurvivors keeps the longest member (ties to min id) per cluster") {
    val docs = Tables.documents(spark, sfDir)
    val survivors = Pipeline
      .dedupSurvivors(docs, "doc_id", "text", "n_chars", 3, 16, 4)
      .select($"cluster_id", $"survivor_id", $"n_members", $"saved_chars")
      .as[(Long, Long, Long, Long)].collect()
    val clusters = graft.dedup.Dedup
      .dupClusters(docs, "doc_id", "text", 3, 16, 4)
      .join(docs.select($"doc_id", $"n_chars"), "doc_id")
      .select($"cluster_id", $"doc_id", $"n_chars".cast("long"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(survivors.length == clusters.size)
    survivors.foreach { case (cid, sid, n, saved) =>
      val members = clusters(cid)
      assert(n == members.length)
      val expect = members.map { case (_, id, ch) => (ch, -id) }.max
      assert(sid == -expect._2, s"cluster $cid")
      assert(saved == members.map(_._3).sum - expect._1)
    }
  }

  test("decontaminate flags a planted benchmark copy and only that") {
    val docs = Seq(
      (20L, "the quick brown fox jumps over the lazy dog today"), // bench
      (1L, "the quick brown fox jumps over the lazy dog today"),  // copy
      (2L, "completely unrelated text about training data pipelines here"),
      (40L, "another benchmark document with its own distinct phrasing")) // bench
      .toDF("doc_id", "text")
    val flagged = Pipeline.decontaminate(docs, "doc_id", "text", 3,
        pmod(col("doc_id"), lit(20)) === 0, 3)
      .select($"doc_id", $"bench_id", $"n_shared").as[(Long, Long, Long)]
      .collect().toList
    assert(flagged.map(f => (f._1, f._2)) == List((1L, 20L)))
    assert(flagged.head._3 >= 3)
  }

  test("repetition signals: planted boilerplate scores, prose near zero") {
    val docs = Seq(
      (1L, "a b a b a b"),               // top bigram "a b" x3 of 5; tri 4 total / 2 distinct
      (2L, "one two three four five six"),  // no repetition at all
      (3L, "x y"))                       // no trigram population -> dropped
      .toDF("doc_id", "text")
    val got = Pipeline.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Int, String, Long, Double, Double)].collect().toList
    assert(got.map(_._1) == List(1L, 2L))
    val d1 = got.head
    // "a b a b a b": 11 chars, top bigram "a b" (3 hits x 3 chars)
    assert(d1._3 == "a b" && d1._4 == 3L)
    assert(d1._5 == math.rint(3 * 3.0 / 11 * 1e6) / 1e6)
    assert(d1._6 == 0.5) // 4 trigrams, 2 distinct
    val d2 = got(1)
    assert(d2._4 == 1L && d2._6 == 0.0)
  }

  test("unigram LM profile: exact bit-bucket arithmetic on a known corpus") {
    // counts: a=3 ('11', 2 bits), b=1, c=1 (1 bit each)
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = Pipeline.unigramLmProfile(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toList
    //            (id, n_tokens, n_distinct, rare, min_cnt, avg_bits)
    assert(got == List(
      (1L, 3L, 2L, 1L, 1L, math.rint(5.0 / 3 * 1e6) / 1e6), // 2*2 + 1 bits
      (2L, 2L, 2L, 1L, 1L, 1.5)))                           // 2 + 1 bits
  }

  test("unigram LM profile: deterministic and token-conserving on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val prof = Pipeline.unigramLmProfile(docs, "doc_id", "text")
    val rows = prof.as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.length == docs.count())
    // total tokens equals the whitespace token count of the corpus
    val toks = docs.select(sum(size(split($"text", " ")))).as[Long].head()
    assert(rows.map(_._2).sum == toks)
    val again = Pipeline.unigramLmProfile(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.sameElements(again))
  }

  test("domain mixture: quota and threshold math, realized sample matches the predicate") {
    val docs = Tables.documents(spark, sfDir)
    val mix = Pipeline.domainMixture(docs, "source", "doc_id", 10000, 3, 10, 20)
    val rows = mix.as[(String, Long, Long, Long, Long, Double)].collect()
    val total = docs.count()
    val quota = math.floor(total * 3 / 200.0).toLong
    rows.foreach { case (_, avail, q, thr, sampled, share) =>
      assert(q == math.min(avail, quota))
      assert(thr == math.floor(q * 10000 / avail.toDouble).toLong)
      assert(sampled >= 0 && sampled <= avail)
      assert(share == math.rint(sampled.toDouble / avail * 1e6) / 1e6)
    }
    assert(rows.map(_._2).sum == total)
    // realized counts equal applying the published predicate to the corpus
    val thrs = rows.map(r => r._1 -> r._4).toMap
    val byPredicate = docs
      .select($"source", graft.functions.Text.hashBucket($"doc_id", 10000).as("b"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.count(_.getLong(1) < thrs(s)).toLong }
    rows.foreach { case (s, _, _, _, sampled, _) => assert(byPredicate(s) == sampled) }
  }

  test("p1 curation pipeline: funnel is sequential, stages agree with their standalone operators") {
    val docs = Tables.documents(spark, sfDir)
    val funnel = SparkEntry.queries("p1_curation_pipeline")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect()
    assert(funnel.nonEmpty)
    // every source of the corpus appears exactly once
    assert(funnel.map(_._1).toSeq.sorted ==
      docs.select($"source").distinct().as[String].collect().toSeq.sorted)
    // the funnel only narrows: docs >= exact >= surv >= clean >= decontam >= sampled
    funnel.foreach { case (s, n, ex, sv, cl, dc, sm, toks, bins, first) =>
      assert(n >= ex && ex >= sv && sv >= cl && cl >= dc && dc >= sm, s)
      assert(sm == 0 || (toks > 0 && bins > 0 && first.nonEmpty), s)
      assert(sm > 0 || (toks == 0 && bins == 0 && first.isEmpty), s)
    }
    // stage cross-checks against the standalone operators:
    // exact survivors == d1's canonical count
    val d1Canon = graft.dedup.Dedup.exact(docs, "doc_id", "text").count()
    assert(funnel.map(_._3).sum == d1Canon)
    // near-dup survivors == d7's cluster count (one survivor per cluster)
    val d7Clusters = graft.dedup.ClusterCache.documents(spark, sfDir)
      .select($"cluster_id").distinct().count()
    assert(funnel.map(_._4).sum == d7Clusters)
    // something must actually survive the whole chain on this corpus
    assert(funnel.map(_._7).sum > 0)
  }
}
