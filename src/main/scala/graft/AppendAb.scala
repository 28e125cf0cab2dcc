package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-append A/B (dev tool, the INDEX_AB delta leg): on a
  * copy of `sfDir`'s embeddings corpus, time (1) the vector-family
  * artifact build, (2) folding a `deltaFrac` batch of new vectors in
  * via CellIndexCache.appendVectorDelta (frozen anchors/codebooks),
  * and (3) the full vector-family rebuild the fingerprint bust would
  * otherwise force on the grown corpus. The whole point of the append
  * path is leg 2 ≪ leg 3.
  *
  * Usage: runMain graft.AppendAb [sfDir] [deltaFrac]
  * Writes one JSON line to GRAFT_APPEND_OUT (default stdout only).
  */
object AppendAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val deltaFrac = if (args.length > 1) args(1).toDouble else 0.10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ann.CellIndexCache
    import graft.sources.IndexStore

    val work = java.nio.file.Files.createTempDirectory("graft_append_ab").toString
    val dir = s"$work/corpus"
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .write.parquet(s"$dir/embeddings.parquet")
    val n0 = spark.read.parquet(s"$dir/embeddings.parquet").count()

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val vectorArtifacts: Seq[(String, () => org.apache.spark.sql.DataFrame,
        Option[String])] = {
      def k2() = CellIndexCache.embeddings(spark, dir).k2
      Seq(
        ("cells", () => CellIndexCache.embeddingsWithCell(spark, dir), Some("cell")),
        ("centroids", () => CellIndexCache.centroids(spark, dir)
          .select(expr(s"c_cell div ${k2()}").as("g_grp"), col("c_cell"),
            col("c_vec")), Some("g_grp")),
        ("gcents", () => CellIndexCache.groupCentroids(spark, dir), None),
        ("pqcodebook", () => CellIndexCache.pqCodebook(spark, dir), None),
        ("pqcodes", () => CellIndexCache.pqCodes(spark, dir), Some("c_cell")),
        ("rawpqcodebook", () => CellIndexCache.rawPqCodebook(spark, dir), None),
        ("rawpqcodes", () => CellIndexCache.rawPqCodes(spark, dir), Some("__vid")))
    }
    def buildAll(): Unit = {
      sys.props(IndexStore.EnvFlag) = "0" // build mode: never read-from-self
      CellIndexCache.clear()
      vectorArtifacts.foreach { case (a, b, key) =>
        IndexStore.write(b(), dir, a, key); () }
      sys.props.remove(IndexStore.EnvFlag)
      CellIndexCache.clear()
    }

    val (_, baseBuildS) = timed(buildAll())

    // delta: fresh deterministic unit vectors with new ids (the
    // GenData Box-Muller shape — xxhash-seeded, no RNG state)
    val dims = graft.sources.Tables.EmbDims
    val deltaN = (n0 * deltaFrac).toLong
    val delta = spark.range(deltaN)
      .select((col("id") + 10000000L).as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), d =>
          (pmod(xxhash64(col("id"), d, lit(7)), lit(2001L)) - 1000L)
            .cast("float") / 1000f).as("__raw"),
        (pmod(xxhash64(col("id")), lit(10L))).cast("int").as("label"))
      .select(col("vec_id"),
        transform(col("__raw"), x => x / sqrt(aggregate(col("__raw"),
          lit(0.0d), (acc, y) => acc + y * y))).as("embedding"),
        col("label"))
    delta.write.mode("append").parquet(s"$dir/embeddings.parquet")

    val (report, appendS) = timed(CellIndexCache.appendVectorDelta(spark, dir))
    require(report.deltaRows == deltaN, s"delta mismatch: $report")

    val (_, rebuildS) = timed(buildAll())

    val json =
      f"""{"corpus_rows": $n0, "delta_rows": $deltaN, """ +
      f""""base_build_s": $baseBuildS%.2f, "append_s": $appendS%.2f, """ +
      f""""rebuild_grown_s": $rebuildS%.2f, """ +
      f""""rebuild_over_append": ${rebuildS / appendS}%.2f, """ +
      f""""imbalance": ${report.imbalance}%.3f, """ +
      f""""pq_skipped": ${report.pqSkipped}, """ +
      f""""rebuild_recommended": ${report.rebuildRecommended}}"""
    println(json)
    sys.env.get("GRAFT_APPEND_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
