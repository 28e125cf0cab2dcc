package graft

import org.apache.spark.sql.SparkSession
import graft.dedup.Dedup

/** x16 containment direct-vs-prefix A/B (dev tool, the X11/X17Probe
  * pattern): times both exact arms on a corpus and checks their pair
  * sets are identical. Args: sfDir (default the generated sf1 —
  * x16's 26.4s sf1 wall is the r11 verdict's item 4). */
object X16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "data/sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sh = graft.dedup.ClusterCache.postings(spark, sfDir, 3)
    sh.count() // warm the shared postings build out of the timings
    val dfc = sh.groupBy(org.apache.spark.sql.functions.col("shingle"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("__df"))
      .localCheckpoint()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def med3(f: => Long): (Double, Long) = {
      val rs = Seq(time(f), time(f), time(f))
      (rs.map(_._1).sorted.apply(1), rs.head._2)
    }

    val tau = 0.6
    // interleaved A/B (one rep each, alternating, median per arm):
    // back-to-back med3 groups sat entirely inside/outside contention
    // waves and misattributed ~1.6x to the arm that ran second
    val plainT = scala.collection.mutable.ArrayBuffer.empty[Double]
    val pruneT = scala.collection.mutable.ArrayBuffer.empty[Double]
    var nPlain = 0L; var nDirect = 0L
    for (_ <- 1 to 3) {
      val (tp, np) = time(Dedup.containmentDirect(sh, tau, pruneUnique = false).count())
      plainT += tp; nPlain = np
      val (td, nd) = time(Dedup.containmentDirect(sh, tau).count())
      pruneT += td; nDirect = nd
    }
    val tPlain = plainT.sorted.apply(1)
    val tDirect = pruneT.sorted.apply(1)
    println(f"[x16probe] direct (no df>=2 prune): $tPlain%.2fs ($nPlain pairs; reps ${plainT.map(t => f"$t%.1f").mkString(",")})")
    println(f"[x16probe] direct (df>=2 prune):    $tDirect%.2fs ($nDirect pairs; reps ${pruneT.map(t => f"$t%.1f").mkString(",")})")

    // pair-set identity (not just counts)
    val d = Dedup.containmentDirect(sh, tau, pruneUnique = false)
      .selectExpr("id_a", "id_b", "shared", "n_a", "containment")
    val p = Dedup.containmentDirect(sh, tau)
      .selectExpr("id_a", "id_b", "shared", "n_a", "containment")
    val diff = d.exceptAll(p).count() + p.exceptAll(d).count()
    println(s"[x16probe] symmetric diff rows: $diff (must be 0)")
    // NOT timed by default: the prefix arm at sf1 exhausted >60 GB of
    // shuffle spill in its verify join (candidate x n_a fan-out under
    // the one-sided size bound) — the measured negative result that
    // keeps the router's direct default on flat-df corpora. Set
    // GRAFT_X16_PREFIX=1 to reproduce on a small corpus.
    if (sys.env.get("GRAFT_X16_PREFIX").contains("1")) {
      val (tPrefix, nPrefix) = med3(Dedup.containmentPrefix(sh, dfc, tau).count())
      println(f"[x16probe] prefix: $tPrefix%.2fs ($nPrefix pairs)")
    }
    spark.stop()
  }
}
