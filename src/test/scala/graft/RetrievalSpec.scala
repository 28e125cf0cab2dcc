package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Pipeline, Retrieval}
import graft.sources.Tables

/** BM25 retrieval, RRF fusion, and retrieval-based decontamination
  * (x20/x21/a11): hand-computed scores, the CollectMinK-vs-window
  * cross-derivation, fusion arithmetic, and the relative-threshold
  * flag rule. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def dw(docs: org.apache.spark.sql.DataFrame) =
    Pipeline.docWordTable(docs, "doc_id", "text")

  // the exact arithmetic bm25Scored implements, re-derived in scala
  private def scoreQ6(tf: Long, df: Long, dl: Long, n: Long, l: Long): Long = {
    def bits(x: Long) = java.lang.Long.toBinaryString(x).length
    val idf = bits(n) - bits(df) + 1
    math.floor(1000000.0 * idf.toDouble *
      ((22L * tf * l).toDouble / (10L * tf * l + 3L * l + 9L * dl * n).toDouble)).toLong
  }

  test("bm25Scored matches the hand-derived arithmetic on a planted corpus") {
    val docs = Seq(
      (0L, "dup dup dup pad"),   // tf(dup)=3, dl=4
      (1L, "dup pad pad pad"),   // tf(dup)=1, dl=4
      (2L, "pad pad pad pad"),   // no query terms
      (3L, "dup")                // tf=1, dl=1 (short doc boost)
    ).toDF("doc_id", "text")
    val queries = Seq((0L, "dup")).toDF("query_id", "term")
    val got = Retrieval.bm25Scored(dw(docs), docs, "doc_id", queries)
      .select($"query_id", $"doc_id", $"score_q6")
      .as[(Long, Long, Long)].collect().map { case (_, d, s) => d -> s }.toMap
    // N=4 docs, L=13 tokens, df(dup)=3
    val exp = Map(
      0L -> scoreQ6(3, 3, 4, 4, 13),
      1L -> scoreQ6(1, 3, 4, 4, 13),
      3L -> scoreQ6(1, 3, 1, 4, 13))
    assert(got == exp)
    // doc 2 (no query term) absent; tf monotone; short doc beats long at equal tf
    assert(!got.contains(2L))
    assert(got(0L) > got(1L) && got(3L) > got(1L))
  }

  test("bm25TopK equals the exact window ranking (cross-derivation)") {
    val docs = Tables.documents(spark, sfDir)
    val queries = Seq((0L, "dup"), (0L, "merge"), (1L, "spark"),
      (1L, "window"), (1L, "agg")).toDF("query_id", "term")
    val scored = Retrieval.bm25Scored(dw(docs), docs, "doc_id", queries)
    val viaAgg = Retrieval.bm25TopK(scored, "doc_id", 10)
      .select($"query_id", $"rank", $"doc_id", $"score_q6")
      .as[(Long, Int, Long, Long)].collect().toSet
    val w = Window.partitionBy($"query_id")
      .orderBy($"score_q6".desc, $"doc_id".asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"query_id", $"rank", $"doc_id", $"score_q6")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("unknown query terms contribute nothing; all-unknown queries vanish") {
    val docs = Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text")
    val queries = Seq((0L, "a"), (0L, "zzz"), (1L, "zzz"))
      .toDF("query_id", "term")
    val scored = Retrieval.bm25Scored(dw(docs), docs, "doc_id", queries)
      .select($"query_id", $"doc_id", $"score_q6")
      .as[(Long, Long, Long)].collect()
    // q1 (only 'zzz') retrieves nothing; q0 scores doc 0 on 'a' alone
    assert(scored.forall(_._1 == 0L))
    assert(scored.map(_._2).toSet == Set(0L))
    val exp = scoreQ6(1, 1, 2, 2, 4)
    assert(scored.head._3 == exp)
  }

  test("duplicate query tokens collapse: raw-token queries score once per term") {
    val docs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    val once = Seq((0L, "a"), (0L, "b")).toDF("query_id", "term")
    val dup = Seq((0L, "a"), (0L, "a"), (0L, "a"), (0L, "b"))
      .toDF("query_id", "term")
    val t = dw(docs)
    val a = Retrieval.bm25Scored(t, docs, "doc_id", once)
      .as[(Long, Long, Long)].collect().toSet
    val b = Retrieval.bm25Scored(t, docs, "doc_id", dup)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("int64 overflow fails loudly (the bm25 saturation products' safety line)") {
    // bm25Scored's 22*tf*L / (10*tf*L + 3*L + 9*dl*N) products assume
    // overflow is an ERROR, not a wrap (Retrieval.scala doc): pin that
    // the session actually runs ANSI so a wrapped-negative micro-score
    // can never silently corrupt a contamination report
    assert(spark.conf.get("spark.sql.ansi.enabled").toBoolean,
      "bm25's int64-product safety assumes ANSI overflow errors")
    val e = intercept[Exception] {
      Seq(Long.MaxValue).toDF("x").select($"x" * lit(10L)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("overflow"),
      s"expected ARITHMETIC_OVERFLOW, got: ${e.getMessage.take(200)}")
  }

  test("rrfFuse: hand-computed fusion, one-leg docs, rank-0 backfill") {
    val lex = Seq((0L, 1, 10L), (0L, 2, 11L)).toDF("query_id", "rank", "doc_id")
      .select($"query_id", $"doc_id", $"rank")
    val vec = Seq((0L, 1, 11L), (0L, 2, 12L)).toDF("query_id", "rank", "doc_id")
      .select($"query_id", $"doc_id", $"rank")
    val fused = Retrieval.rrfFuse(lex, vec, "doc_id", 10)
      .select($"rank", $"doc_id", $"rrf", $"lex_rank", $"vec_rank")
      .as[(Int, Long, Double, Int, Int)].collect().sortBy(_._1)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 11: lex rank 2 + vec rank 1; docs 10/12 one leg each
    assert(fused.map(f => (f._2, f._4, f._5)).toSeq ==
      Seq((11L, 2, 1), (10L, 1, 0), (12L, 0, 2)))
    assert(fused(0)._3 == r6(1.0 / 62 + 1.0 / 61))
    assert(fused(1)._3 == r6(1.0 / 61))
    assert(fused(2)._3 == r6(1.0 / 62))
  }

  test("x21 relative rule: qmax arithmetic and flag containment") {
    val docs = Tables.documents(spark, sfDir)
    val queries = Seq((0L, "dup"), (0L, "merge"), (1L, "spark"))
      .toDF("query_id", "term")
    val table = dw(docs)
    val scored = Retrieval.bm25Scored(table, docs, "doc_id", queries)
    val qmax = Retrieval.bm25QueryMax(table, docs, queries)
      .as[(Long, Long)].collect().toMap
    // qmax = sum of 2200000*idf_bits over the query's distinct terms
    def bits(x: Long) = java.lang.Long.toBinaryString(x).length
    val n = docs.count()
    val dfm = table.groupBy($"w").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    def qm(terms: Seq[String]) =
      terms.flatMap(t => dfm.get(t).map(df => 2200000L * (bits(n) - bits(df) + 1))).sum
    assert(qmax(0L) == qm(Seq("dup", "merge")))
    assert(qmax(1L) == qm(Seq("spark")))
    // every score is below its query's asymptote; the θ=7/10 report
    // flags exactly the docs the raw rule flags
    val joined = scored
      .join(Retrieval.bm25QueryMax(table, docs, queries), Seq("query_id"))
      .select($"doc_id", $"score_q6", $"qmax_q6")
      .as[(Long, Long, Long)].collect()
    assert(joined.forall { case (_, s, m) => s < m })
    val expFlagged = joined.filter { case (_, s, m) => s * 10 >= m * 7 }
      .map(_._1).toSet
    val report = Retrieval.retrievalContamination(scored,
        Retrieval.bm25QueryMax(table, docs, queries),
        docs, "doc_id", "source", 7, 10)
      .select($"n_docs", $"n_flagged").as[(Long, Long)].collect()
    assert(report.map(_._1).sum == docs.count())
    assert(report.map(_._2).sum == expFlagged.size)
  }

  test("hardNegatives = lex top-k minus vec top-k, lex order kept") {
    val lex = Seq((0L, 5L, 1, 900L), (0L, 6L, 2, 800L), (0L, 7L, 3, 700L),
        (1L, 5L, 1, 600L))
      .toDF("query_id", "doc_id", "rank", "score_q6")
    val vec = Seq((0L, 6L), (1L, 9L)).toDF("query_id", "doc_id")
    val got = Retrieval.hardNegatives(lex, vec, "doc_id")
      .as[(Long, Long, Int, Long)].collect().toSeq
    // doc 6 is vector-near for q0 (not a hard negative); q1's vec list
    // misses doc 5 entirely so it stays
    assert(got == Seq((0L, 5L, 1, 900L), (0L, 7L, 3, 700L),
      (1L, 5L, 1, 600L)))
  }

  test("RetrievalCache shared legs match the direct computations") {
    val docs = Tables.documents(spark, sfDir)
    val qdocs = graft.operators.RetrievalCache.QueryDocs
    val table = dw(docs)
    val queries = table.filter($"doc_id".isin(qdocs: _*))
      .select($"doc_id".as("query_id"), $"w".as("term"))
    val directLex = Retrieval.bm25TopK(
        Retrieval.bm25Scored(table, docs, "doc_id", queries)
          .filter($"doc_id" =!= $"query_id"), "doc_id", 20)
      .select($"query_id", $"rank", $"doc_id", $"score_q6")
      .as[(Long, Int, Long, Long)].collect().toSet
    val directVec = graft.ann.Ann.knnBrute(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", qdocs, 20)
      .select($"query_id", $"nn_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val (lex, vec) = graft.operators.RetrievalCache.hybridLegs(spark, sfDir)
    val cachedLex = lex.select($"query_id", $"rank", $"doc_id", $"score_q6")
      .as[(Long, Int, Long, Long)].collect().toSet
    val cachedVec = vec.select($"query_id", $"doc_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(cachedLex == directLex)
    assert(cachedVec == directVec)
  }

  test("x20 plan shape: query/df/stat joins broadcast, one shuffled dl join") {
    val docs = Tables.documents(spark, sfDir)
    val queries = Seq((0L, "dup"), (1L, "spark"), (1L, "agg"))
      .toDF("query_id", "term")
    val scored = Retrieval.bm25Scored(dw(docs), docs, "doc_id", queries)
    val plan = Retrieval.bm25TopK(scored, "doc_id", 10)
      .queryExecution.executedPlan.toString
    // the query-term semi filter, per-term df, and the two 1-row stat
    // tables all ride broadcasts; only the doc-length attach (and the
    // aggregations) shuffle
    val nBroadcast = "BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findAllIn(plan).length
    assert(nBroadcast >= 4, s"expected >=4 broadcast joins, got $nBroadcast")
    assert(!plan.contains("CartesianProduct"),
      "stat crossJoins must broadcast, not cartesian")
    val nShuffledJoin = "SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(plan).length
    assert(nShuffledJoin <= 1,
      s"only the dl join may shuffle, got $nShuffledJoin:\n$plan")
  }
}
