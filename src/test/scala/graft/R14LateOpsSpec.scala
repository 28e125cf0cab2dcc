package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.multimodal.Binary
import graft.operators.{Pipeline, TimeSeries}
import graft.sources.Tables

/** Hand-derivations + invariants for the r14 closing batch:
  * ts35 (ACF), x28 (PMI collocations), m9 (scene cuts), a18 (MMR). */
class R14LateOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- ts35 ----------------------------------------------------------------

  test("acf: alternating series hand-derivation, constant/single series NULL out") {
    // u1 alternates 1,-1,1,-1: mean 0, milli-devs ±1000;
    //   den = 4e6; num1 = 3·(−1e6) → acf1 = −0.75
    //   num2 = 2·(+1e6) → acf2 = 0.5; num3 = −1e6 → acf3 = −0.25
    // u2 constant: devs 0 → den 0 → NULL acfs
    // u3 single event → den 0 → NULL acfs
    val rows =
      Seq((1L, 0L, 1.0), (1L, 1L, -1.0), (1L, 2L, 1.0), (1L, 3L, -1.0),
        (2L, 0L, 5.0), (2L, 1L, 5.0),
        (3L, 0L, 7.0))
    val df = rows.toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("event_id", col("user_id") * 100 + col("ts").cast("long"))
    val out = TimeSeries.acf(df, "user_id", "ts", "event_id", "value", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toList
    assert(out === List(
      (1L, 4L, Some(-0.75), Some(0.5), Some(-0.25)),
      (2L, 2L, None, None, None),
      (3L, 1L, None, None, None)))
  }

  test("acf: a lag-2 periodic series scores acf2 near 1 and above acf1") {
    // period-2 signal 10,0,10,0,... over one key: successive samples
    // anti-correlate, lag-2 samples correlate — the diagnostic the
    // operator exists to surface
    val rows = (0 until 40).map(i => (1L, i.toLong, if (i % 2 == 0) 10.0 else 0.0))
    val df = rows.toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("event_id", col("ts").cast("long"))
    val r = TimeSeries.acf(df, "user_id", "ts", "event_id", "value", 3)
      .collect().head
    val (acf1, acf2) = (r.getDouble(2), r.getDouble(3))
    assert(acf1 < -0.9 && acf2 > 0.9 && acf2 > acf1)
  }

  // ---- x28 -----------------------------------------------------------------

  test("pmiCollocations: hand-derived bit PMI, minCount prunes the hapax tail") {
    // corpus: 6 docs "a b", 1 doc "x x x x".
    // N = 16 tokens; n_a = n_b = 6, n_x = 4.
    // bigrams: "a b" ×6, "x x" ×3.
    // pmi("a b") = bits(6)+bits(16)−bits(6)−bits(6) = 3+5−3−3 = 2
    // pmi("x x") = bits(3)+bits(16)−bits(4)−bits(4) = 2+5−3−3 = 1
    val docs = ((1 to 6).map(i => (i.toLong, "a b")) :+ (7L, "x x x x"))
      .toDF("doc_id", "text")
    val dw = Pipeline.docWordTable(docs, "doc_id", "text")
    val strict = Pipeline.pmiCollocations(docs, dw, "doc_id", "text", 5, 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(strict === List(("a b", 6L, 6L, 6L, 2L)))
    val loose = Pipeline.pmiCollocations(docs, dw, "doc_id", "text", 2, 20)
      .collect().map(r => (r.getString(0), r.getLong(4))).toList
    assert(loose === List(("a b", 2L), ("x x", 1L)))
  }

  test("pmiCollocations ranks a planted collocation above independent co-occurrences") {
    // "spark shuffle" always adjacent (collocation); "data" and "table"
    // frequent but paired only by chance — PMI must separate them even
    // though raw bigram counts are comparable
    val planted = (0 until 30).map(i =>
      (i.toLong, "spark shuffle data table data table data table"))
    val docs = planted.toDF("doc_id", "text")
    val dw = Pipeline.docWordTable(docs, "doc_id", "text")
    val out = Pipeline.pmiCollocations(docs, dw, "doc_id", "text", 5, 5)
      .collect().map(r => (r.getString(0), r.getLong(4)))
    assert(out.head._1 === "spark shuffle")
    val byBg = out.toMap
    assert(byBg("spark shuffle") > byBg("data table"))
  }

  // ---- m9 ------------------------------------------------------------------

  test("sceneCuts: two-regime payload hand-derivation") {
    // 64 'a' then 64 ' ': frames [a,a,sp,sp] at 32 samples.
    // 'a' frame e = 31²·32 = 30752; ' ' frame e = 96²·32 = 294912.
    // Single cut where the regimes meet (frame 2).
    val docs = Seq((1L, "a" * 64 + " " * 64)).toDF("doc_id", "text")
    val out = Binary.sceneCuts(docs, "doc_id", "text", 32, 700)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(out === List((1L, 4L, 1L, 2L, 2L)))
  }

  test("sceneCuts: uniform payload has no cuts; short payload is one 1-frame scene") {
    val docs = Seq((1L, "b" * 96), (2L, "xy")).toDF("doc_id", "text")
    val out = Binary.sceneCuts(docs, "doc_id", "text", 32, 700)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(4)))).toList
    // (id, n_frames, n_cuts, first_cut_frame)
    assert(out === List((1L, 3L, 0L, None), (2L, 1L, 0L, None)))
  }

  test("sceneCuts totals agree with audioEnergy frame counts on the real corpus") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val sc = Binary.sceneCuts(docs, "doc_id", "text", 256, 700)
      .select(col("doc_id"), col("n_frames"))
    val ae = Binary.audioEnergy(docs, "doc_id", "text", 256, 2000)
      .select(col("doc_id"), col("n_frames").as("ae_frames"))
    val diff = sc.join(ae, "doc_id")
      .filter(col("n_frames") =!= col("ae_frames")).count()
    assert(diff === 0L)
  }

  // ---- a18 -----------------------------------------------------------------

  /** Test-only naive MMR over collected pool+pairs — the independent
    * twin the distributed unrolled greedy must match pick-for-pick. */
  private def naiveMmr(pool: Seq[(Long, Long, Long)],
                       pm: Map[(Long, Long, Long), Long],
                       selectK: Int, lt: Long): Seq[(Long, Int, Long)] =
    pool.map(_._1).distinct.sorted.flatMap { q =>
      val cands = pool.filter(_._1 == q).map(t => (t._2, t._3))
      val picks = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      (1 to selectK).foreach { _ =>
        val rest = cands.filterNot(c => picks.exists(_._1 == c._1))
        val best = rest.map { case (id, rel) =>
          val red = if (picks.isEmpty) 0L
            else picks.map(p => pm((q, id, p._1))).max
          (lt * rel - (10 - lt) * red, rel, id)
        }.sortBy(t => (-t._1, -t._2, t._3)).head
        picks += ((best._3, best._2))
      }
      picks.zipWithIndex.map { case ((id, _), i) => (q, i + 1, id) }
    }

  test("mmrDiversify matches the naive greedy twin at λ∈{3,7}") {
    val emb = Tables.embeddings(spark, sfDir)
    for (lt <- Seq(3, 7)) {
      val got = Ann.mmrDiversify(emb, "vec_id", "embedding",
          Seq(0L, 1L, 2L), 10, 4, lt)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      // independent pool + pair sims straight off knnBrute + cosine
      val pool = Ann.knnBrute(emb, "vec_id", "embedding", Seq(0L, 1L, 2L), 10)
        .select(col("query_id"), col("nn_id"),
          round(col("cos") * 1e6).cast("long").as("rel"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val ids = pool.map(_._2).distinct
      val vecs = emb.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
      def cos(a: Array[Double], b: Array[Double]): Long = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        math.round(BigDecimal(dot / (na * nb))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
      }
      val pm = (for {
        (q, ai, _) <- pool; (q2, bi, _) <- pool
        if q2 == q && ai != bi
      } yield ((q, ai, bi), cos(vecs(ai), vecs(bi)))).toMap
      assert(got === naiveMmr(pool, pm, 4, lt),
        s"λ₁₀=$lt greedy mismatch")
    }
  }

  test("mmrDiversify at λ₁₀=10 degenerates to knnBrute's top-selectK") {
    val emb = Tables.embeddings(spark, sfDir)
    val got = Ann.mmrDiversify(emb, "vec_id", "embedding",
        Seq(0L, 1L), 10, 5, 10)
      .select(col("query_id"), col("pick_rank").as("rank"), col("nn_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    val want = Ann.knnBrute(emb, "vec_id", "embedding", Seq(0L, 1L), 10)
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("nn_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    assert(got === want)
  }

  test("mmrDiversify skips an exact duplicate that pure relevance would keep") {
    // v1 and v2 are identical vectors (both ~aligned with query 0);
    // v3 is distinct but still relevant. Pure top-2 keeps the dup;
    // MMR at λ=0.5 must pick v3 second.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.7f, 0.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val pure = Ann.mmrDiversify(emb, "vec_id", "embedding", Seq(0L), 3, 2, 10)
      .collect().map(_.getLong(2)).toList
    val mmr = Ann.mmrDiversify(emb, "vec_id", "embedding", Seq(0L), 3, 2, 5)
      .collect().map(_.getLong(2)).toList
    assert(pure === List(1L, 2L)) // relevance alone keeps the duplicate
    assert(mmr === List(1L, 3L))  // MMR diversifies past it
  }
}
