package graft

import org.apache.spark.sql.SparkSession
import graft.ann.Ann
import graft.sources.Tables

/** Recall-vs-probed-fraction sweep backing the a4 recall-targeted
  * nprobe rule (dev tool; judge artifact ANN_SWEEP_r10.json).
  *
  * For each sf the full nprobe range [1, cells] is swept (a coarse
  * grid above 16 cells) against the exact `knnBrute` top-10, recording
  * per point the probed CELL fraction f = nprobe/cells, the measured
  * recall@10, and the model prediction 1 − (1−f)^2.7 the
  * `Ann.recommendedNprobe` operating point (⌈449·cells/1000⌉) was
  * derived from. The claim under test (Ann.scala): on this
  * near-uniform synthetic corpus every sweep point collapses onto one
  * recall(f) curve across corpus sizes, so holding the FRACTION holds
  * recall flat where a constant nprobe decays as cells grow ∝ n.
  * The artifact records max |measured − predicted| per sf and the
  * realized recall at the operating point so the claim is checkable
  * against numbers, not prose. */
object NprobeSweep {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("GRAFT_NPROBE_OUT", "ANN_SWEEP_r10.json")
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

    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val k = 10
    val Exp = 2.7

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
      ix.asg.unpersist()
      println(f"[$sfDir] cells=$cells op nprobe=$opPoint recall=$opRecall%.2f " +
        f"max|measured-pred|=$maxAbsErr%.3f")
      s"""  {"sf_dir": "$sfDir", "n": $n, "cells": $cells,
         |   "recommended_nprobe": $opPoint,
         |   "recommended_frac": ${f"${opPoint.toDouble / cells}%.4f"},
         |   "recall_at_recommended": ${f"$opRecall%.3f"},
         |   "median_s_at_recommended": ${f"$opLat%.3f"},
         |   "max_abs_err_vs_model": ${f"$maxAbsErr%.3f"},
         |   "points": [
         |${rows.mkString(",\n")}
         |   ]}""".stripMargin
    }
    val json =
      s"""{"sweep": "a4 IVF recall@10 vs probed-cell fraction (recall-targeted nprobe rule)",
         |"model": "recall(f) = 1 - (1-f)^$Exp; operating point f = 449/1000",
         |"queries": ${queries.size}, "k": $k,
         |"sweeps": [
         |${sections.mkString(",\n")}
         |]}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(s"[nprobesweep] wrote $out")
    spark.stop()
  }
}
