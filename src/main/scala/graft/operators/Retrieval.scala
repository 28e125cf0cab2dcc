package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Sparse (lexical) retrieval over the shared (id, w, tf) doc-word
  * table — BM25 scoring, top-k search, reciprocal-rank fusion with a
  * vector leg, and retrieval-based decontamination. These are the
  * query-side passes a training-data pipeline runs against a curated
  * corpus: benchmark-probe decontamination (the fuzzy complement of
  * x8's exact 13-gram rule) and hybrid lexical+vector neighbor search.
  *
  * Everything is cross-engine EXACT by construction (the x11/x17
  * discipline): IDF uses the integer bit-length quantization
  * idf_bits(w) = bits(N) − bits(df) + 1, and the BM25 term-frequency
  * saturation — the one genuinely fractional factor — is evaluated as
  * ONE IEEE division of two exactly-representable int64 products,
  * then floor-quantized to a BIGINT micro-score BEFORE the per-query
  * sum. Integer sums are order-independent, so Spark's partial
  * aggregation and DuckDB's single-threaded sum agree bit-for-bit
  * (a float Σ idf·sat would be summation-order-dependent).
  *
  * Scale shape: the query table is tiny and broadcast; df for the
  * query terms only is derived from the query-filtered postings (never
  * a full-vocabulary broadcast); the one corpus-sized join is
  * doc-length attachment — an equi-join on the doc id. Top-k per query
  * is the bounded CollectMinK aggregate (map-side partial top-k), not
  * a per-query window sort over every matching document.
  */
object Retrieval {

  /** BM25 constants k1 = 1.2, b = 0.75 as exact rationals: with
    * avgdl = L/N the per-term saturation
    *   tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * multiplies through by 10·L into the integer-exact form
    *   22·tf·L / (10·tf·L + 3·L + 9·dl·N).
    * Both products stay far inside int64 until L·tf ≈ 9·10^17
    * (Spark ANSI mode and DuckDB both fail loudly on overflow). */
  private val SatNum = 22L
  private val SatDenTf = 10L
  private val SatDenL = 3L
  private val SatDenDl = 9L

  /** The query-term derivation [[bm25Scored]] and [[bm25QueryMax]]
    * share — ONE copy so the score/qmax relationship x21 thresholds on
    * cannot drift: q = distinct (query_id, w) (classic BM25 scores
    * each distinct query term once), filt = the query-FILTERED
    * postings (df derives from it, so the aggregate never
    * materializes the full vocabulary), nRow = the corpus count. */
  private def queryTermStats(docWord: DataFrame, docs: DataFrame,
      queries: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val q = queries.select(col("query_id"), col("term").as("w")).distinct()
    val qTerms = q.select(col("w")).distinct()
    val filt = docWord.join(broadcast(qTerms), Seq("w"))
    val dfQ = filt.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nRow = docs.agg(count(lit(1)).as("n_docs"))
    (q, filt, dfQ, nRow)
  }

  /** idf_bits = bits(N) − bits(df) + 1 over the joined (df, n_docs)
    * columns — the x11/x17 integer quantization, one definition. */
  private def idfBits: org.apache.spark.sql.Column =
    (length(bin(col("n_docs"))) - length(bin(col("df"))) + 1).cast("long")

  /** Per-(query, doc) BM25 micro-scores: Σ_terms ⌊10^6 · idf_bits ·
    * sat⌋ as BIGINT `score_q6`. `queries` is a (query_id, term) table,
    * assumed small (a benchmark probe set / a handful of query docs)
    * and broadcast. `docs` supplies N (the same corpus count x17's
    * idf uses); `docWord` is the shared ClusterCache.docWordTf table.
    *
    * Docs sharing no term with a query simply don't appear (BM25 of
    * an empty match set is 0 — standard sparse-retrieval semantics).
    * Duplicate (query_id, term) rows are collapsed — classic BM25
    * scores each distinct query term once; without the distinct a
    * caller passing raw (unaggregated) query tokens would silently
    * double-count.
    *
    * `docLen`, if given, is a precomputed (<id>, dl, l_total) table
    * (graft.dedup.ClusterCache.docLengths' shape) — dl = the doc's
    * token count, l_total = the corpus token total on every row. The
    * values are exact integers either way, so passing it cannot change
    * a score; it only moves the doc-sized aggregate out of the query. */
  def bm25Scored(docWord: DataFrame, docs: DataFrame, id: String,
                 queries: DataFrame,
                 docLen: Option[DataFrame] = None): DataFrame = {
    val (q, filt, dfQ, nRow) = queryTermStats(docWord, docs, queries)
    // (id, dl, l_total): dl = Σ tf per doc, l_total = the corpus token
    // total on every row — derived here when no shared table is passed;
    // production callers pass ClusterCache.docLengths so the doc-sized
    // aggregate runs ONCE per corpus, not once per consumer cache.
    val dlt = docLen.getOrElse {
      val dl = docWord.groupBy(col(id)).agg(sum(col("tf")).cast("long").as("dl"))
      dl.crossJoin(broadcast(dl.agg(sum(col("dl")).cast("long").as("l_total"))))
    }
    filt
      .join(broadcast(q), Seq("w"))
      .join(broadcast(dfQ), Seq("w"))
      .join(dlt, Seq(id))
      .crossJoin(broadcast(nRow))
      .withColumn("idf_bits", idfBits)
      .withColumn("term_q6",
        floor(lit(1000000.0) * col("idf_bits").cast("double") *
          ((lit(SatNum) * col("tf") * col("l_total")).cast("double") /
           (lit(SatDenTf) * col("tf") * col("l_total") +
            lit(SatDenL) * col("l_total") +
            lit(SatDenDl) * col("dl") * col("n_docs")).cast("double")))
          .cast("long"))
      .groupBy(col("query_id"), col(id))
      .agg(sum(col("term_q6")).as("score_q6"))
  }

  /** Top-k docs per query from a [[bm25Scored]] table, ranked
    * (score_q6 DESC, id ASC) via the bounded CollectMinK aggregate
    * over an order-encoding key — map-side partial top-k, so the
    * exchange after scoring carries ≤ k rows per query however many
    * documents matched (the x17 shape; a per-query window would sort
    * every matching doc in one task per query). */
  def bm25TopK(scored: DataFrame, id: String, k: Int): DataFrame = {
    val Big = 10000000000000L // 10^13 > any Σ 10^6·idf_bits·2.2
    val IdCap = 1000000000000L // 10^12: the 12-digit id pad
    val invScore = when(col("score_q6") >= lit(Big) || col("score_q6") < 0,
        raise_error(concat(lit("bm25TopK: score breaks the order key: "),
          col("score_q6").cast("string"))))
      .otherwise(lit(Big) - col("score_q6"))
    val idPad = when(col(id) >= lit(IdCap) || col(id) < 0,
        raise_error(concat(lit("bm25TopK: id breaks the order key: "),
          col(id).cast("string"))))
      .otherwise(col(id))
    val key = concat_ws(" ",
      lpad(invScore.cast("string"), 14, "0"),
      lpad(idPad.cast("string"), 12, "0"))
    scored
      .groupBy(col("query_id"))
      .agg(Dedup.collectMinK(key.as("__k"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__k")))
      .withColumn("__p", split(col("__k"), " "))
      .select(col("query_id"), (col("__pos") + 1).as("rank"),
        col("__p").getItem(1).cast("long").as(id),
        (lit(Big) - col("__p").getItem(0).cast("long")).as("score_q6"))
      .orderBy("query_id", "rank")
  }

  /** Reciprocal-rank fusion of a lexical and a vector ranking
    * (Cormack et al. 2009): rrf = Σ_legs 1/(C + rank), summed over the
    * legs that retrieved the doc. Both inputs are (query_id, <id>,
    * rank) top-k tables, so the fused candidate set is ≤ 2k per query
    * — the final window is bounded regardless of corpus size. The two
    * 1/(C+rank) terms are IEEE doubles from small exact integers added
    * in a fixed order, so both engines produce identical doubles; the
    * 6-dp round is display/compare convention, not a correctness
    * crutch. */
  def rrfFuse(lex: DataFrame, vec: DataFrame, id: String, k: Int,
              c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = lex.select(col("query_id"), col(id), col("rank").as("lex_rank"))
    val v = vec.select(col("query_id"), col(id), col("rank").as("vec_rank"))
    val contrib = (r: org.apache.spark.sql.Column) =>
      coalesce(lit(1.0) / (lit(c.toLong) + r).cast("double"), lit(0.0))
    val fused = l.join(v, Seq("query_id", id), "full_outer")
      .withColumn("rrf", round(contrib(col("lex_rank")) +
        contrib(col("vec_rank")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col(id).asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      // rank 0 = "not retrieved by this leg" (keeps the columns
      // non-nullable integers — no NULL-vs-NaN hashing asymmetry)
      .select(col("query_id"), col("rank"), col(id), col("rrf"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"))
      .orderBy("query_id", "rank")
  }

  /** Hard-negative mining for contrastive retrieval training
    * (DPR, Karpukhin et al. 2020): candidates the LEXICAL leg ranks in
    * its top-k that the VECTOR leg does NOT — lexically confusable,
    * semantically distant, exactly the negatives that teach an
    * embedding model the difference. A pure anti-join of the two
    * bounded top-k tables, so the operator costs nothing beyond the
    * legs it consumes and its output is ≤ k rows per query at any
    * corpus size. */
  def hardNegatives(lex: DataFrame, vec: DataFrame, id: String): DataFrame =
    lex.select(col("query_id"), col(id), col("rank").as("lex_rank"),
        col("score_q6"))
      .join(vec.select(col("query_id"), col(id)), Seq("query_id", id),
        "left_anti")
      .orderBy("query_id", "lex_rank")

  /** Per-query maximum attainable BM25 micro-score: qmax_q6 =
    * Σ_terms ⌊2.2·10^6 · idf_bits⌋ = Σ 2200000·idf_bits — the
    * saturation asymptote (tf → ∞ drives the saturation factor to
    * k1+1 = 2.2). score_q6/qmax_q6 is the corpus-size-STABLE relative
    * score x21 thresholds on: raw BM25 grows with bits(N), so an
    * absolute cut that flags 5% of a 10^3-doc corpus flags 90% of the
    * 10^4 twin (measured), while the θ-of-qmax rule holds its rate
    * across scales (8.8% at both sf0.01 and sf0.1 for θ = 0.7). */
  def bm25QueryMax(docWord: DataFrame, docs: DataFrame,
                   queries: DataFrame): DataFrame = {
    val (q, _, dfQ, nRow) = queryTermStats(docWord, docs, queries)
    q.join(broadcast(dfQ), Seq("w"))
      .crossJoin(broadcast(nRow))
      .withColumn("idf_bits", idfBits)
      .groupBy(col("query_id"))
      .agg(sum(lit(2200000L) * col("idf_bits")).as("qmax_q6"))
  }

  /** Retrieval-based decontamination report: the per-source rate of
    * documents reaching ≥ thetaNum/thetaDen of ANY benchmark probe's
    * maximum attainable BM25 mass ([[bm25QueryMax]]). The fuzzy
    * complement of x8's exact n-gram rule — a paraphrased benchmark
    * leaks few exact 13-grams but still ranks high under BM25. The
    * threshold compare is integer cross-multiplication (engine-exact,
    * no division). Output is sources-sized; the only corpus-sized
    * steps are [[bm25Scored]]'s joins and one left join attaching the
    * flag set back to the corpus. */
  def retrievalContamination(scored: DataFrame, qmax: DataFrame,
                             docs: DataFrame, id: String, source: String,
                             thetaNum: Int, thetaDen: Int): DataFrame = {
    val flagged = scored.join(broadcast(qmax), Seq("query_id"))
      .filter(col("score_q6") * thetaDen >= col("qmax_q6") * thetaNum)
      .select(col(id)).distinct().withColumn("__f", lit(1L))
    docs.select(col(id), col(source))
      .join(flagged, Seq(id), "left")
      .groupBy(col(source)).agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("__f"), lit(0L))).as("n_flagged"))
      .withColumn("flag_rate",
        round(col("n_flagged") / col("n_docs").cast("double"), 6))
      // NULLS LAST to match SQL engines' default ASC placement (Spark
      // alone defaults NULLS FIRST — a row-ORDER parity trap on
      // corpora with a NULL source; the driver gate sorts rows, but
      // ordered consumers shouldn't have to)
      .orderBy(asc_nulls_last(source))
  }
}
