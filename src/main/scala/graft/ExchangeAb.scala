package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exchange-volume A/B (dev tool): the d5 pair job's shuffle-write
  * bytes and wall under ADAPTIVE hot-cell sub-block sharding (the
  * production default) vs UNCONDITIONAL sharding (every cell sharded,
  * the pre-round-8 behavior, forced here with hotCellThreshold = 0).
  *
  * On a corpus whose cells sit at the target size — the steady state,
  * since k1·k2 tracks n/targetCellSize — unconditional sharding
  * replicates each probe-side row's full vector ×subBlocks through
  * the (cell, sb) exchange for no straggler benefit; adaptive keeps
  * those cells on a single (cell, 0) key. This probe quantifies the
  * cut on the 64× rotated-replica corpus ScaleProbe materializes
  * (~128k 64-float vectors; run ScaleProbe first or pass a dir whose
  * embeddings_x64 exists).
  *
  * Writes one JSON line to GRAFT_EXCHANGE_OUT (default stdout only).
  */
object ExchangeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val slug = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val corpusPath = s"/tmp/graft_scale/$slug/embeddings_x64"
    require(new java.io.File(corpusPath).exists(),
      s"$corpusPath missing — run graft.ScaleProbe $sfDir first")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val emb = spark.read.parquet(corpusPath)
    val n = emb.count()
    val ix = graft.ann.Ann.buildCoarseIndex(emb, "vec_id", "embedding", n)
    ix.asg.persist().count() // index build excluded from both legs

    def leg(thr: Int): (Double, Long, Long) = {
      def run(): Long = graft.ann.Ann.nearDupPairsScaledIndexed(
        emb, "vec_id", "embedding", 0.25, ix, hotCellThreshold = thr).count()
      run() // warm-up
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      shuffleBytes.set(0)
      val rows = run()
      Thread.sleep(1000) // let the listener bus drain task-end events
      (walls.sorted.apply(1), shuffleBytes.get, rows)
    }

    val (wAd, bAd, rAd) = leg(graft.ann.Ann.DefaultHotCellThreshold)
    val (wAll, bAll, rAll) = leg(0)
    require(rAd == rAll, s"pair counts diverged: $rAd vs $rAll")
    val json =
      f"""{"corpus_rows": $n, "pairs": $rAd, """ +
      f""""adaptive": {"wall_s": $wAd%.3f, "shuffle_write_bytes": $bAd}, """ +
      f""""all_sharded": {"wall_s": $wAll%.3f, "shuffle_write_bytes": $bAll}, """ +
      f""""bytes_ratio_all_over_adaptive": ${bAll.toDouble / bAd}%.2f, """ +
      f""""wall_ratio_all_over_adaptive": ${wAll / wAd}%.2f}"""
    println(json)
    sys.env.get("GRAFT_EXCHANGE_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
