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
    val (tDirect, nDirect) = med3(Dedup.containmentDirect(sh, tau).count())
    println(f"[x16probe] direct: $tDirect%.2fs ($nDirect pairs)")
    val (tPrefix, nPrefix) = med3(Dedup.containmentPrefix(sh, dfc, tau).count())
    println(f"[x16probe] prefix: $tPrefix%.2fs ($nPrefix pairs)")

    // pair-set identity (not just counts)
    val d = Dedup.containmentDirect(sh, tau)
      .selectExpr("id_a", "id_b", "shared", "n_a", "containment")
    val p = Dedup.containmentPrefix(sh, dfc, tau)
      .selectExpr("id_a", "id_b", "shared", "n_a", "containment")
    val diff = d.exceptAll(p).count() + p.exceptAll(d).count()
    println(s"[x16probe] symmetric diff rows: $diff (must be 0)")
    spark.stop()
  }
}
