package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** L=2 vs L=3 product-quantizer A/B (dev tool): the generalized
  * depth's assignment-term claim (NOTES_r8 §2) under measurement at
  * the largest corpus this box holds — the 64× dimension-rotated
  * replica corpus (~128k 64-float vectors, the ScaleProbe
  * construction, self-materialized here).
  *
  * What the depth buys is the ANCHOR ASSIGNMENT: per-row cosines fall
  * from Σks(L=2) = 2·⌈√C⌉ to Σks(L=3) = 3·⌈∛C⌉ (and the anchor
  * broadcast shrinks the same factor) while the pair job stays
  * linear either way. At 128k rows that is 90 → 38 anchors (C≈2000);
  * at 10¹² rows it is 250k → 7.5k — this probe measures the small end
  * of the same curve plus the price paid (probe fan-out, pair-job
  * wall) and the pair-set agreement between the two depths.
  *
  * Writes one JSON line to GRAFT_PQ_OUT (default stdout only).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val slug = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val reps = sys.env.getOrElse("GRAFT_PQ_REPS", "64").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the ScaleProbe rotated-replica corpus (same path, so the two
    // tools share the materialization when both run)
    val corpusPath = s"/tmp/graft_scale/$slug/embeddings_x$reps"
    if (!new java.io.File(corpusPath).exists()) {
      val e1 = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      (0 until reps).map { i =>
        val s = i % 64
        val rot = if (s == 0) col("embedding")
          else concat(slice(col("embedding"), s + 1, 64 - s),
            slice(col("embedding"), 1, s))
        e1.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          rot.as("embedding"))
      }.reduce(_ unionByName _).repartition(32).write.parquet(corpusPath)
    }
    val emb = spark.read.parquet(corpusPath)
    val n = emb.count()

    def med3(body: => Long): (Double, Long) = {
      body // warm-up
      var rows = 0L
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); rows = body
        (System.nanoTime() - t0) / 1e9
      }
      (walls.sorted.apply(1), rows)
    }

    def leg(levels: Int): (Seq[Int], Double, Double, Long, DataFrame) = {
      // index build = the anchor-assignment job, measured cold each
      // rep (unpersist between) — this is the term the depth attacks
      val ks = graft.ann.Ann.coarseCellParamsL(n, graft.ann.Ann.DefaultTargetCellSize, levels)
      val (wBuild, _) = med3 {
        graft.ann.Ann.buildCoarseIndexL(emb, "vec_id", "embedding", n, levels)
          .asg.count()
      }
      val ix = graft.ann.Ann.buildCoarseIndexL(emb, "vec_id", "embedding", n, levels)
      val asg = ix.asg.persist()
      asg.count()
      val pinned = ix.copy(asg = asg)
      val (wPairs, pairRows) = med3 {
        graft.ann.Ann.nearDupPairsScaledIndexedL(
          emb, "vec_id", "embedding", 0.25, pinned).count()
      }
      val pairs = graft.ann.Ann.nearDupPairsScaledIndexedL(
        emb, "vec_id", "embedding", 0.25, pinned)
        .select("id_a", "id_b", "cos").localCheckpoint()
      (ks, wBuild, wPairs, pairRows, pairs)
    }

    val (ks2, build2, pairsW2, rows2, pairDf2) = leg(2)
    val (ks3, build3, pairsW3, rows3, pairDf3) = leg(3)
    // overlap at the reporting tau is noise-band physics (wide-angle
    // pairs co-block near-randomly under EITHER depth — same story as
    // ANN_SWEEP_r8's noise-band recall); the dedup-predictive number
    // is the HIGH-cosine overlap, where both depths must and do agree
    def ids(df: DataFrame, tau: Double) =
      df.filter(col("cos") >= tau).select("id_a", "id_b")
    val common = ids(pairDf2, 0).intersect(ids(pairDf3, 0)).count()
    val hi2 = ids(pairDf2, 0.4).count()
    val hi3 = ids(pairDf3, 0.4).count()
    val hiCommon = ids(pairDf2, 0.4).intersect(ids(pairDf3, 0.4)).count()

    val json =
      f"""{"corpus_rows": $n, "target_cell_size": ${graft.ann.Ann.DefaultTargetCellSize}, """ +
      f""""recommended_levels_here": ${graft.ann.Ann.recommendedLevels(n)}, """ +
      f""""recommended_levels_1e12": ${graft.ann.Ann.recommendedLevels(1000000000000L)}, """ +
      f""""l2": {"ks": [${ks2.mkString(",")}], "anchors_per_row": ${ks2.sum}, """ +
      f""""assign_wall_s": $build2%.3f, "pair_wall_s": $pairsW2%.3f, "pairs": $rows2}, """ +
      f""""l3": {"ks": [${ks3.mkString(",")}], "anchors_per_row": ${ks3.sum}, """ +
      f""""assign_wall_s": $build3%.3f, "pair_wall_s": $pairsW3%.3f, "pairs": $rows3}, """ +
      f""""anchor_cut_l2_over_l3": ${ks2.sum.toDouble / ks3.sum}%.2f, """ +
      f""""assign_wall_l2_over_l3": ${build2 / build3}%.2f, """ +
      f""""pair_overlap_frac_of_l2": ${common.toDouble / math.max(1L, rows2)}%.4f, """ +
      f""""highcos_tau04": {"l2_pairs": $hi2, "l3_pairs": $hi3, """ +
      f""""overlap_frac_of_l2": ${hiCommon.toDouble / math.max(1L, hi2)}%.4f}}"""
    println(json)
    sys.env.get("GRAFT_PQ_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
