package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vec

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - `knnBrute`: exact cosine top-k for an explicit (small) query set —
  *    the query side is broadcast, the corpus side is scanned once,
  *    projected to (id, vector) only; per-query ranking is a window over
  *    the query id. This is the correctness baseline.
  *  - `knnBlocked`: IVF-style — restrict candidates to the query's
  *    coarse cell (here: a precomputed partition/label column). At 100 TB
  *    the cell column is the bucketing key, so a probe touches only its
  *    cell's partitions instead of the full corpus.
  *  - random-hyperplane LSH bucketing (round 2) follows the same shape
  *    with sign-bit bucket keys.
  */
object Ann {

  /** Exact top-k cosine neighbors for each id in `queryIds`.
    * Deterministic: ranked by rounded cosine desc, then neighbor id. */
  def knnBrute(emb: DataFrame, id: String, vec: String,
               queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = emb.select(col(id).as("nn_id"), col(vec).as("nn_vec"))
    val queries = emb.filter(col(id).isin(queryIds: _*))
      .select(col(id).as("query_id"), col(vec).as("q_vec"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        Vec.cosine(col("q_vec"), col("nn_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style top-k within the query's coarse cell (`cell` column). */
  def knnBlocked(emb: DataFrame, id: String, vec: String, cell: String,
                 queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = emb.select(col(id).as("nn_id"), col(vec).as("nn_vec"),
      col(cell).as("nn_cell"))
    val queries = emb.filter(col(id).isin(queryIds: _*))
      .select(col(id).as("query_id"), col(vec).as("q_vec"), col(cell).as("q_cell"))
    val scored = corpus.join(broadcast(queries),
        col("nn_cell") === col("q_cell") && col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        Vec.cosine(col("q_vec"), col("nn_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic random-hyperplane set for sign-bit LSH (seeded —
    * identical across executors and runs). */
  def lshPlanes(dims: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dims)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id from the hyperplane set — native expression
    * (the per-plane `aggregate(zip_with(...))` HOF tree it replaces is
    * interpreter-bound); bit-identical accumulation order. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.LshBucket(
      ColumnBridge.expression(vec), planes.map(_.toIndexedSeq).toIndexedSeq))
  }

  /** All XOR masks with popcount <= `h` over `bits` bit positions —
    * the hamming ball a multi-probe query enumerates:
    * sum of C(bits, 0..h) masks, ascending popcount. */
  def hammingBall(bits: Int, h: Int): Seq[Long] = {
    def combos(start: Int, k: Int): Seq[Long] =
      if (k == 0) Seq(0L)
      else (start to bits - k).flatMap(p => combos(p + 1, k - 1).map(_ | (1L << p)))
    (0 to math.min(h, bits)).flatMap(combos(0, _))
  }

  /** ANN top-k via multi-probe random-hyperplane LSH: candidates are
    * corpus rows whose sign-bit bucket is within `probeHamming` of the
    * query's bucket; ranking is exact cosine over that candidate set.
    *
    * The hamming ball is enumerated on the QUERY side — each query
    * explodes into its C(planes, <=probeHamming) adjacent bucket ids —
    * so the candidate lookup is an EQUI-join on `bucket`. The physical
    * plan is a BroadcastHashJoin keyed on the bucket (never a
    * nested-loop over the corpus): with the corpus bucketed/partitioned
    * by `bucket` at scale, a probe batch touches only the enumerated
    * buckets' partitions. Recall vs `knnBrute` is spec-checked and the
    * full pipeline is oracle-checked (a2), the seeded planes being
    * deterministic on both engines. */
  def knnLsh(emb: DataFrame, id: String, vec: String, queryIds: Seq[Long],
             k: Int, planes: Int, probeHamming: Int, seed: Long): DataFrame = {
    require(planes <= 63, s"at most 63 hyperplanes supported, got $planes")
    val dims = 64
    val ps = lshPlanes(dims, planes, seed)
    val masks = hammingBall(planes, probeHamming)
    val bucketed = emb.select(col(id), col(vec),
      lshBucket(col(vec), ps).as("bucket"))
    val corpus = bucketed.select(col(id).as("nn_id"), col(vec).as("nn_vec"),
      col("bucket"))
    // distinct masks -> distinct probe buckets per query, so each
    // (query, corpus row) pair joins at most once — no dedup needed
    val probes = bucketed.filter(col(id).isin(queryIds: _*))
      .select(col(id).as("query_id"), col(vec).as("q_vec"),
        col("bucket").as("q_bucket"))
      // ONE constant array literal, XOR after the explode: a per-mask
      // array(q_bucket ^ lit(m), ...) inlines every element into the
      // generated code and blows janino's 64KB method cap at
      // C(24, <=3) = 2325 masks
      .withColumn("m", explode(lit(masks.toArray)))
      .withColumn("bucket", col("q_bucket").bitwiseXOR(col("m")))
      .drop("m")
    val scored = corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        Vec.cosine(col("q_vec"), col("nn_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding near-dup pairs: cosine ≥ tau within the same coarse cell
    * (cell-blocked so the pair space never goes quadratic corpus-wide).
    *
    * The in-cell pair work is additionally sharded into `subBlocks`
    * deterministic hash sub-blocks: the probe side replicates to every
    * sub-block and the build side keeps its own, so the join key is
    * (cell, sub-block) and a HOT cell's O(n²) candidate work spreads
    * over `subBlocks` tasks instead of serializing in one straggler.
    * Each unordered pair still surfaces exactly once — (x,y) meets at
    * y's sub-block, (y,x) at x's, and the id_a < id_b filter keeps one
    * — so the output set is identical to the unsharded join (the
    * sub-block id never reaches the output, and the oracle is
    * unchanged). Replication cost: probe side × subBlocks. */
  def nearDupPairs(emb: DataFrame, id: String, vec: String, cell: String,
                   tau: Double, subBlocks: Int = 8): DataFrame = {
    val a = emb.select(col(id).as("id_a"), col(vec).as("vec_a"), col(cell).as("cell"))
      .withColumn("sb", explode(array((0 until subBlocks).map(lit): _*)))
    val b = emb.select(col(id).as("id_b"), col(vec).as("vec_b"), col(cell).as("cell"),
      pmod(hash(col(id)), lit(subBlocks)).as("sb"))
    a.join(b, Seq("cell", "sb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cell"), col("id_a"), col("id_b"),
        Vec.cosine(col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= tau)
      .orderBy(col("id_a"), col("id_b"))
  }
}
