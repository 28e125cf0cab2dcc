package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.sources.Tables

/** ANN realism sweep (dev tool): a2's multi-probe LSH across plane
  * counts and probe radii, scored for recall against the exact
  * `knnBrute` top-k and timed. At 8 planes the hamming ball covers a
  * third of the 256-bucket space — fine at sf0.1, pointless at scale;
  * production runs 16-24 planes, where the ball is a vanishing fraction
  * of the bucket space and recall is bought with the probe radius.
  * The artifact records that tradeoff machine-readably per
  * (planes, probeHamming): recall@k, ball size vs bucket space, mean
  * candidate rows per query, median latency.
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = sys.env.getOrElse("GRAFT_ANN_OUT", "ANN_SWEEP_r5.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val k = 10

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = Seq(time(f), time(f), time(f)).sorted.apply(1)

    val truth = Ann.knnBrute(emb, "vec_id", "embedding", queries, k)
      .select("query_id", "nn_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Three recall notions, because they answer different questions:
    //  - recall@k vs the exact brute top-k: on a near-uniform corpus
    //    most of a query's top-10 are just random directions (cosine
    //    ~0.3-0.5) — no LSH at any realistic probe radius finds those,
    //    so this number COLLAPSES once bucket space >> corpus. That is
    //    uniform-data physics, not an implementation defect.
    //  - corpus pair recall at tau=0.25 (d5's near-dup threshold; this
    //    synthetic corpus's max pair cosine is ~0.6, so 0.25 IS its
    //    near-dup tier): fraction of such pairs whose buckets differ by
    //    <= probeHamming bits. tau=0.25 pairs sit ~75 deg apart —
    //    angular LSH cannot and should not bridge that, so this number
    //    is honest about the corpus, not about the operator.
    //  - planted pair reachability at cosine ~0.95 (a REAL near-dup —
    //    re-encoded/boilerplate content): each sample vector is
    //    deterministically perturbed (xxhash64 noise, no RNG state) to
    //    ~0.95 cosine and the probe-reach probability measured. This
    //    characterizes the operator's geometry independent of the
    //    corpus and is the number that predicts 100 TB dedup recall.
    // Fixed 2000-vector sample so the cost is sf-independent.
    val sample = emb.select(col("vec_id").as("sid"), col("embedding").as("sv"))
      .limit(2000).localCheckpoint()
    // distinct projections, not .as() dataset aliases: a self-join of
    // one checkpointed plan can resolve both sides of the condition to
    // the same attribute and silently produce zero rows
    val sideA = sample.select(col("sid").as("sa"), col("sv").as("va"))
    val sideB = sample.select(col("sid").as("sb"), col("sv").as("vb"))
    val closePairs = sideA.join(sideB, col("sa") < col("sb"))
      .filter(graft.functions.Vec.cosine(col("va"), col("vb")) >= 0.25)
      .localCheckpoint()
    val nClose = closePairs.count()

    // noise scale 0.329*|v| on an orthogonal-in-expectation direction
    // -> cos ~ 1/sqrt(1+0.329^2) ~ 0.95; the artifact records the
    // MEASURED mean cosine, not the target
    val planted = sample
      .withColumn("u", transform(sequence(lit(0), lit(63)), i =>
        (pmod(xxhash64(col("sid"), i), lit(2001L)).cast("double") - 1000.0) / 1000.0))
      .withColumn("scale",
        lit(0.329) * graft.functions.Vec.norm(col("sv")) / graft.functions.Vec.norm(col("u")))
      .withColumn("pv", zip_with(col("sv").cast("array<double>"), col("u"),
        (a, b) => a + col("scale") * b).cast("array<float>"))
      .select(col("sid"), col("sv"), col("pv"))
      .localCheckpoint()
    val plantedCos = planted
      .agg(avg(graft.functions.Vec.cosine(col("sv"), col("pv")))).head().getDouble(0)

    // (planes, probeHamming, tables): the r5 single-table rows plus the
    // OR-amplified multi-table grid at production plane counts — the
    // union recall should track 1-(1-q1)^L for the single-table q1
    val configs = Seq(
      (8, 3, 1), (16, 2, 1), (16, 3, 1), (24, 3, 1),
      (16, 2, 4), (16, 2, 8), (16, 3, 4), (16, 3, 8),
      (16, 3, 12), (16, 3, 16), (24, 3, 16), (24, 4, 16))
    val rows = configs.map { case (planes, h, tables) =>
      val q = Ann.knnLsh(emb, "vec_id", "embedding", queries, k, planes, h,
        42L, tables)
      q.count() // warm
      val lat = med3(q.count())
      val got = q.select("query_id", "nn_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (got & truth).size.toDouble / truth.size
      // candidate volume: corpus rows landing in any probed (table,
      // bucket) — candidate_rows is what the equi-join processes
      // (once per colliding table), candidate_distinct the deduped
      // union that reaches the ranker
      val ball = Ann.hammingBall(planes, h).size
      val perTable = (0 until tables).map(t =>
        Ann.lshPlanes(64, planes, 42L + t))
      val bucketed = emb.select(col("vec_id") +:
        perTable.zipWithIndex.map { case (ps, t) =>
          Ann.lshBucket(col("embedding"), ps).as(s"b$t") }: _*)
      val qb = bucketed.filter(col("vec_id").isin(queries: _*)).collect()
      val probed: Seq[(Int, Long)] = qb.flatMap(r =>
        (0 until tables).flatMap(t =>
          Ann.hammingBall(planes, h).map(m => (t, r.getLong(1 + t) ^ m)))).distinct
      // join, not isin: the probed set reaches ~65k buckets at
      // (24, h=4) and a 65k-literal In() blows up codegen
      import spark.implicits._
      val probedDf = probed.toDF("tbl", "bucket")
      val exploded = bucketed.select(col("vec_id"),
          posexplode(array((0 until tables).map(t => col(s"b$t")): _*)))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
      val candJoined = exploded.join(broadcast(probedDf), Seq("tbl", "bucket"))
        .localCheckpoint()
      val candRows = candJoined.count()
      val candDistinct = candJoined.select("vec_id").distinct().count()
      // free the per-config checkpoint blocks — 12 configs otherwise
      // accumulate them in the block manager and skew later configs
      org.apache.spark.sql.graftbridge.ColumnBridge
        .unpersistLocalCheckpoint(candJoined)
      def anyTableHit(a: Column, b: Column): Column =
        perTable.map(ps => bit_count(Ann.lshBucket(a, ps)
          .bitwiseXOR(Ann.lshBucket(b, ps))) <= h)
          .reduce(_ || _).cast("int")
      val pairRecall = if (nClose == 0) -1.0 else closePairs
        .select(anyTableHit(col("va"), col("vb")).as("hit"))
        .agg(avg(col("hit"))).head().getDouble(0)
      val plantedReach = planted
        .select(anyTableHit(col("sv"), col("pv")).as("hit"))
        .agg(avg(col("hit"))).head().getDouble(0)
      println(f"planes=$planes%2d h=$h L=$tables%2d recall=$recall%.2f " +
        f"pair_recall_t025=$pairRecall%.2f planted_reach=$plantedReach%.2f " +
        f"lat=$lat%.2fs ball=$ball/${1L << planes} cand=$candRows/$candDistinct")
      f"""  {"planes": $planes, "probe_hamming": $h, "tables": $tables,
         |   "recall_at_$k": $recall%.3f,
         |   "corpus_pair_recall_tau025": $pairRecall%.3f,
         |   "planted_pair_reach": $plantedReach%.3f,
         |   "median_s": $lat%.3f, "ball_buckets": $ball,
         |   "bucket_space": ${1L << planes},
         |   "candidate_rows": $candRows, "candidate_distinct": $candDistinct}""".stripMargin
    }
    val json = s"""{"sf_dir": "$sfDir", "k": $k, "queries": ${queries.size},
                  |"corpus_pairs_tau025": $nClose,
                  |"planted_pairs": 2000, "planted_mean_cos": ${f"$plantedCos%.4f"},
                  |"configs": [
                  |${rows.mkString(",\n")}
                  |]}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(s"[annsweep] wrote $out")
    spark.stop()
  }
}
