package graft

import org.apache.spark.sql.SparkSession
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

    val configs = Seq((8, 3), (16, 2), (16, 3), (24, 2), (24, 3), (24, 4))
    val rows = configs.map { case (planes, h) =>
      val q = Ann.knnLsh(emb, "vec_id", "embedding", queries, k, planes, h, 42L)
      q.count() // warm
      val lat = med3(q.count())
      val got = q.select("query_id", "nn_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (got & truth).size.toDouble / truth.size
      // candidate volume: corpus rows landing in any probed bucket
      val ball = Ann.hammingBall(planes, h).size
      val ps = Ann.lshPlanes(64, planes, 42L)
      val bucketed = emb.select(col("vec_id"),
        Ann.lshBucket(col("embedding"), ps).as("bucket"))
      val qb = bucketed.filter(col("vec_id").isin(queries: _*))
        .select(col("bucket").as("qb"))
      val probed = qb.collect().map(_.getLong(0)).flatMap(b =>
        Ann.hammingBall(planes, h).map(b ^ _)).toSet
      val cand = bucketed.filter(col("bucket").isin(probed.toSeq: _*)).count()
      println(f"planes=$planes%2d h=$h recall=$recall%.2f lat=$lat%.2fs " +
        f"ball=$ball/${1L << planes} candidates=$cand")
      f"""  {"planes": $planes, "probe_hamming": $h, "recall_at_$k": $recall%.3f,
         |   "median_s": $lat%.3f, "ball_buckets": $ball,
         |   "bucket_space": ${1L << planes}, "candidate_rows": $cand}""".stripMargin
    }
    val json = s"""{"sf_dir": "$sfDir", "k": $k, "queries": ${queries.size},
                  |"configs": [
                  |${rows.mkString(",\n")}
                  |]}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(s"[annsweep] wrote $out")
    spark.stop()
  }
}
