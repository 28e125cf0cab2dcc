package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** m5 hot-bucket A/B (dev tool): the phash candidate join's wall and
  * straggler profile on a planted hot-bucket fingerprint corpus, with
  * the adaptive sub-block sharding ON (production default) vs OFF
  * (hotThreshold = MaxValue — the pre-round-17 single-bucket join).
  *
  * The planted corpus is the degenerate media-lake shape: `hotFrac` of
  * the corpus shares ONE constant 16-bit chunk value (flat/dark frames
  * all aHash-chunking to 0x0000) while the other three chunks stay
  * uniform — so the (0, 0x0000) bucket holds hotFrac·n rows and its
  * quadratic candidate set lands in ONE task unless sharded. The pair
  * SET is identical in both legs (sharding is semantics-preserving;
  * the m5 oracle counts every ≥1-chunk-equal pair), so the A/B isolates
  * the skew: same rows out, max-task wall cut ~×subBlocks.
  *
  * Writes one JSON line to GRAFT_PHASH_OUT (default stdout only).
  */
object PhashAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40000)
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // force the sort-merge regime the production corpus is in (sf1's
      // 2.4M legs never broadcast); the explicit broadcast(hot) hint
      // inside phashCandidates is unaffected by the threshold. AQE
      // stays ON: its skew detection is BYTE-based (256MB default) and
      // a CPU-quadratic hot bucket is only ~200KB — exactly why the
      // manual sub-block sharding exists.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val maxTaskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          maxTaskMs.getAndUpdate(m => math.max(m, t.taskMetrics.executorRunTime))
    })

    // planted fingerprints: hotFrac of rows pin c0 = 0x0000, everything
    // else uniform 16-bit (xxhash64-derived — deterministic, no RNG)
    val hotN = (n * hotFrac).toLong
    val ph = spark.range(n)
      .select(col("id").as("doc_id"),
        when(col("id") < hotN, lit(0L))
          .otherwise(pmod(xxhash64(col("id"), lit(0)), lit(65536L))).as("c0"),
        pmod(xxhash64(col("id"), lit(1)), lit(65536L)).as("c1"),
        pmod(xxhash64(col("id"), lit(2)), lit(65536L)).as("c2"),
        pmod(xxhash64(col("id"), lit(3)), lit(65536L)).as("c3"))
      .persist()
    ph.count()

    def leg(thr: Int): (Double, Long, Long) = {
      def run(): Long = graft.multimodal.Binary
        .phashCandidates(ph, "doc_id", hotThreshold = thr).count()
      run() // warm-up
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      maxTaskMs.set(0)
      val rows = run()
      Thread.sleep(1000) // let the listener bus drain task-end events
      (walls.sorted.apply(1), maxTaskMs.get, rows)
    }

    val (wAd, tAd, rAd) = leg(graft.multimodal.Binary.PhashHotBucketThreshold)
    val (wOff, tOff, rOff) = leg(Int.MaxValue)
    require(rAd == rOff, s"pair counts diverged: $rAd vs $rOff")
    val json =
      f"""{"corpus_rows": $n, "hot_rows": $hotN, "pairs": $rAd, """ +
      f""""sharded": {"wall_s": $wAd%.3f, "max_task_ms": $tAd}, """ +
      f""""unsharded": {"wall_s": $wOff%.3f, "max_task_ms": $tOff}, """ +
      f""""wall_ratio_unsharded_over_sharded": ${wOff / wAd}%.2f, """ +
      f""""max_task_ratio": ${tOff.toDouble / math.max(tAd, 1)}%.2f}"""
    println(json)
    sys.env.get("GRAFT_PHASH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
