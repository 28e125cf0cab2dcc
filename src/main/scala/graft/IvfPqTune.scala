package graft

import org.apache.spark.sql.SparkSession
import graft.ann.Ann

/** One-off operating-point probe for a9's (codebook size, rerank
  * width) on the planted-cluster corpus (dev tool backing the
  * constants pinned in Ann.scala; see ANN_SWEEP_r11 for the shipped
  * sweep). */
object IvfPqTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nClusters = 40; val perCluster = 500; val dim = 64; val noise = 0.15
    val rnd = new scala.util.Random(1234567L)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    val rows = (0 until nClusters * perCluster).map { i =>
      val c = i % nClusters
      (i.toLong, centers(c).map(v => (v + noise * rnd.nextGaussian()).toFloat))
    }
    val emb = spark.createDataset(rows).toDF("vec_id", "embedding")
      .repartition(32).localCheckpoint()
    val n = emb.count()
    val ix = Ann.buildCoarseIndex(emb, "vec_id", "embedding", n)
    ix.asg.persist().count()
    val cells = ix.k1 * ix.k2
    val withCell = Ann.withCoarseCellIndexed(emb, "vec_id", ix).localCheckpoint()
    val cents = Ann.ivfCentroids(withCell, "embedding", "cell").localCheckpoint()
    val queries = (0L until 25L).toSeq
    val truth = Ann.knnBrute(emb, "vec_id", "embedding", queries, 10)
      .select("query_id", "nn_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val np = Ann.ivfPqNprobe(cells.toLong)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (kCode <- Seq(16, 64, 256)) {
      val cb = Ann.ivfPqCodebook(withCell, "vec_id", "embedding", "cell",
        cents, k = kCode).localCheckpoint()
      val codes = Ann.ivfPqCodes(withCell, "vec_id", "embedding", "cell",
        cents, cb).localCheckpoint()
      for (rerank <- Seq(50, 100, 200)) {
        // the production a9 path: hierarchical probe + packed ADC
        val df = Ann.knnIvfPq(withCell, "vec_id", "embedding", "cell",
          cents, codes, cb, queries, 10, np, rerank, kCb = kCode,
          k2 = ix.k2, groupProbe = Ann.hierGroupProbe(ix.k1, ix.k2, np))
        val got = df.select("query_id", "nn_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (got & truth).size.toDouble / truth.size
        val lat = Seq(time(df.count()), time(df.count()), time(df.count())).sorted.apply(1)
        println(f"[tune] k=$kCode%3d rerank=$rerank%3d nprobe=$np recall@10=$recall%.3f lat=$lat%.2fs")
      }
    }
    spark.stop()
  }
}
