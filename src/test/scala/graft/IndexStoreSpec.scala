package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, CellIndexCache}
import graft.dedup.ClusterCache
import graft.sources.IndexStore

/** The durable bucketed index (IndexStore) must be a TRANSPARENT
  * replacement for the session-built artifacts: every loaded table
  * bit-equal to its built twin, the hierarchical probe's probed set
  * bit-equal through loaded centroids/group-centroids, the production
  * a4/a9/d5-family queries row-identical in load mode (so oracle-green
  * transfers), and — the at-scale point of bucketing — a probe's
  * cell/group filter must PRUNE to the probed buckets at the scan
  * (SelectedBucketsCount in the executed plan). */
class IndexStoreSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def freshCaches(): Unit = {
    CellIndexCache.clear(); ClusterCache.clear()
    graft.multimodal.ChunkCache.clear()
  }

  test("loaded == built, queries transfer, probes bucket-prune") {
    // "0" forces BUILD mode (load is the default since r14) so the
    // reference values below are genuinely session-built
    sys.props(IndexStore.EnvFlag) = "0"
    freshCaches()

    // ---- built (session) artifacts + reference query outputs ----
    val bCells = rows(CellIndexCache.embeddingsWithCell(spark, sfDir))
    val bCents = rows(CellIndexCache.centroids(spark, sfDir))
    val bGc = rows(CellIndexCache.groupCentroids(spark, sfDir))
    val bCodes = rows(CellIndexCache.pqCodes(spark, sfDir))
    val bPairs = rows(CellIndexCache.scaledPairs(spark, sfDir))
    val bClus = rows(ClusterCache.documents(spark, sfDir))
    val bDf = rows(ClusterCache.shingleDf(spark, sfDir))
    val ix = CellIndexCache.embeddings(spark, sfDir)
    val queries = CellIndexCache.embeddingsWithCell(spark, sfDir)
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
      .localCheckpoint()
    val np = Ann.ivfPqNprobe(ix.k1.toLong * ix.k2)
    val gp = Ann.hierGroupProbe(ix.k1, ix.k2, np)
    val bProbed = rows(Ann.probedCellsHier(queries,
      CellIndexCache.centroids(spark, sfDir), ix.k2, np, gp,
      Some(CellIndexCache.groupCentroids(spark, sfDir))))
    def q(name: String) = rows(SparkEntry.queries(name)(spark, sfDir))
    val bQ = Seq("a3_ivf_coarse", "a4_ivf_nprobe", "a9_ivfpq", "a10_index_stats",
      "d5_embedding_neardup", "d6_dup_clusters", "d7_dedup_survivors",
      "d8_semantic_dedup", "x19_novelty").map(n => n -> q(n)).toMap

    // ---- persist, flip to load mode, drop every session cache ----
    val names = IndexStore.writeAll(spark, sfDir)
    assert(names.length == 22 && names.forall(spark.catalog.tableExists))
    // flag REMOVED = the r14 default: auto-load, no env needed
    sys.props.remove(IndexStore.EnvFlag)
    freshCaches()
    try {
      // the cache getters now return the persisted tables
      assert(rows(CellIndexCache.embeddingsWithCell(spark, sfDir)) == bCells)
      assert(rows(CellIndexCache.centroids(spark, sfDir)) == bCents)
      assert(rows(CellIndexCache.groupCentroids(spark, sfDir)) == bGc)
      assert(rows(CellIndexCache.pqCodes(spark, sfDir)) == bCodes)
      assert(rows(CellIndexCache.scaledPairs(spark, sfDir)) == bPairs)
      assert(rows(ClusterCache.documents(spark, sfDir)) == bClus)
      assert(rows(ClusterCache.shingleDf(spark, sfDir)) == bDf)
      // probed set bit-equal through the loaded coarse structures
      val lProbed = rows(Ann.probedCellsHier(queries,
        CellIndexCache.centroids(spark, sfDir), ix.k2, np, gp,
        Some(CellIndexCache.groupCentroids(spark, sfDir))))
      assert(lProbed == bProbed)
      // production queries row-identical in load mode → the committed
      // oracle-green verdict transfers to the persisted index
      bQ.foreach { case (n, expect) => assert(q(n) == expect, n) }

      // ---- the bucketing claim: a probe prunes to its buckets ----
      // a bare filter with no downstream join/agg makes the planner
      // fall back to a non-bucketed scan (autoBucketedScan) and skip
      // pruning — pin the bucketed scan the way a probe session would
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      // the getters above PERSISTED the loaded tables (the r14 warm
      // fix), and Spark's cache manager would substitute the cached
      // full-scan for any later query over the same table — the plan
      // string would then carry the cache-time "32 out of 32", hiding
      // the pruning under test. Drop the caches so the probes below
      // hit the real bucketed parquet scan.
      freshCaches()
      // pin the pruning MECHANIC with a NARROW probe (2 cells → ≤ 2
      // buckets selected): the full production probe covers most of
      // sf0.001's ~32 cells, so at 32 buckets it legitimately hashes
      // into every bucket and `selected < total` would be pinned to a
      // hash accident, not to pruning
      val probedCells = bProbed.map(_(1).asInstanceOf[Long])
        .toSeq.distinct.sorted.take(2)
      def selected(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
        val plan = df.queryExecution.executedPlan.toString
        val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
          .findFirstMatchIn(plan)
        assert(m.isDefined, s"no bucket pruning in plan:\n$plan")
        (m.get.group(1).toInt, m.get.group(2).toInt)
      }
      val (selC, totC) = selected(
        IndexStore.load(spark, sfDir, "cells")
          .filter(col("cell").isin(probedCells: _*)))
      assert(selC < totC, s"cells scan read all $totC buckets")
      val (selP, totP) = selected(
        IndexStore.load(spark, sfDir, "pqcodes")
          .filter(col("c_cell").isin(probedCells: _*)))
      assert(selP < totP, s"pqcodes scan read all $totP buckets")
      val probedGroups = probedCells.map(_ / ix.k2).distinct
      val (selG, totG) = selected(
        IndexStore.load(spark, sfDir, "centroids")
          .filter(col("g_grp").isin(probedGroups: _*)))
      assert(selG < totG, s"centroids scan read all $totG buckets")

      // ---- cross-SESSION durability: a fresh JVM's in-memory
      // catalog has no table entries; only the files + manifest
      // survive. Simulate by dropping every catalog entry (external
      // tables — data stays) and let registerIfNeeded re-attach.
      names.foreach(n => spark.sql(s"DROP TABLE $n"))
      assert(names.forall(n => !spark.catalog.tableExists(n)))
      freshCaches()
      assert(rows(CellIndexCache.embeddingsWithCell(spark, sfDir)) == bCells)
      assert(rows(CellIndexCache.scaledPairs(spark, sfDir)) == bPairs)
      assert(rows(ClusterCache.documents(spark, sfDir)) == bClus)
      // the re-registered table is bucketed again (pruning still on);
      // drop the getter caches first for the same cache-substitution
      // reason as above
      freshCaches()
      val (selC2, totC2) = selected(
        IndexStore.load(spark, sfDir, "cells")
          .filter(col("cell").isin(probedCells: _*)))
      assert(selC2 == selC && totC2 == totC)
    } finally {
      sys.props.remove(IndexStore.EnvFlag)
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      freshCaches()
    }
  }

  test("jaccardPairs: tau-stamped names, write-through self-prime, loaded == built") {
    // tau rides in the table name (the d4 parameter-stamping rule)
    assert(ClusterCache.jaccardPairsArtifact(3, 0.12)
      != ClusterCache.jaccardPairsArtifact(3, 0.5))
    assert(ClusterCache.jaccardPairsArtifact(3, 0.12) == "jpairs_n3_t1200")

    // build-mode reference (pure session build, no durable table)
    sys.props(IndexStore.EnvFlag) = "0"
    freshCaches()
    val built = rows(ClusterCache.jaccardPairs(spark, sfDir, 3, 0.12))
    assert(built.nonEmpty)

    // load mode, artifact absent: first touch must WRITE THROUGH
    sys.props.remove(IndexStore.EnvFlag)
    freshCaches()
    val art = ClusterCache.jaccardPairsArtifact(3, 0.12)
    val name = IndexStore.tableName(sfDir, art)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val whDir = spark.conf.get("spark.sql.warehouse.dir")
      .replaceFirst("^file:", "")
    scala.reflect.io.Directory(new java.io.File(whDir, name)).deleteRecursively()
    try {
      assert(!IndexStore.exists(spark, sfDir, art))
      assert(rows(ClusterCache.jaccardPairs(spark, sfDir, 3, 0.12)) == built)
      assert(IndexStore.exists(spark, sfDir, art), "write-through did not prime")
      // fresh caches: the getter now serves the LOADED table, bit-equal
      freshCaches()
      assert(rows(ClusterCache.jaccardPairs(spark, sfDir, 3, 0.12)) == built)
      // d11/d4 stay green as pure consumers of the loaded artifact
      val d11 = SparkEntry.queries("d11_lsh_recall")(spark, sfDir).collect()
      assert(d11.nonEmpty)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      scala.reflect.io.Directory(new java.io.File(whDir, name)).deleteRecursively()
      freshCaches()
    }
  }

  test("containmentPairs: write-through self-prime, loaded == built") {
    assert(ClusterCache.containmentPairsArtifact(3, 0.6) == "cpairs_n3_t6000")
    sys.props(IndexStore.EnvFlag) = "0"
    freshCaches()
    val built = rows(ClusterCache.containmentPairs(spark, sfDir, 3, 0.6))
    assert(built.nonEmpty)
    sys.props.remove(IndexStore.EnvFlag)
    freshCaches()
    val art = ClusterCache.containmentPairsArtifact(3, 0.6)
    val name = IndexStore.tableName(sfDir, art)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val whDir = spark.conf.get("spark.sql.warehouse.dir")
      .replaceFirst("^file:", "")
    scala.reflect.io.Directory(new java.io.File(whDir, name)).deleteRecursively()
    try {
      assert(rows(ClusterCache.containmentPairs(spark, sfDir, 3, 0.6)) == built)
      assert(IndexStore.exists(spark, sfDir, art), "write-through did not prime")
      freshCaches()
      assert(rows(ClusterCache.containmentPairs(spark, sfDir, 3, 0.6)) == built)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      scala.reflect.io.Directory(new java.io.File(whDir, name)).deleteRecursively()
      freshCaches()
    }
  }

  test("semanticClusters + dsirFeats: write-through self-prime, loaded == built") {
    sys.props(IndexStore.EnvFlag) = "0"
    freshCaches()
    val pred = col("lang") === "en"
    // the artifact name binds the predicate: a different predicate can
    // never load this table (ADVICE r15: the stamp was caller-supplied)
    assert(ClusterCache.dsirFeatsArtifact(4096, pred) !=
      ClusterCache.dsirFeatsArtifact(4096, col("lang") === "de"))
    assert(ClusterCache.dsirFeatsArtifact(4096, pred) ==
      ClusterCache.dsirFeatsArtifact(4096, col("lang") === "en"))
    val builtC = rows(CellIndexCache.semanticClusters(spark, sfDir, 0.4))
    val builtF = rows(ClusterCache.dsirFeats(spark, sfDir, 4096, pred))
    val builtD = rows(ClusterCache.dsirDocStats(spark, sfDir, 4096, pred))
    val builtX25 = rows(SparkEntry.queries("x25_dsir_weights")(spark, sfDir))
    assert(builtC.nonEmpty && builtF.nonEmpty && builtD.nonEmpty)
    sys.props.remove(IndexStore.EnvFlag)
    freshCaches()
    val arts = Seq(CellIndexCache.semanticClustersArtifact(0.4),
      ClusterCache.dsirFeatsArtifact(4096, pred),
      ClusterCache.dsirDocStatsArtifact(4096, pred))
    val whDir = spark.conf.get("spark.sql.warehouse.dir")
      .replaceFirst("^file:", "")
    def drop(): Unit = arts.foreach { a =>
      val name = IndexStore.tableName(sfDir, a)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      scala.reflect.io.Directory(new java.io.File(whDir, name)).deleteRecursively()
    }
    drop()
    try {
      assert(rows(CellIndexCache.semanticClusters(spark, sfDir, 0.4)) == builtC)
      assert(rows(ClusterCache.dsirFeats(spark, sfDir, 4096, pred)) == builtF)
      assert(rows(ClusterCache.dsirDocStats(spark, sfDir, 4096, pred)) == builtD)
      assert(arts.forall(IndexStore.exists(spark, sfDir, _)),
        "write-through did not prime")
      freshCaches()
      assert(rows(CellIndexCache.semanticClusters(spark, sfDir, 0.4)) == builtC)
      assert(rows(ClusterCache.dsirFeats(spark, sfDir, 4096, pred)) == builtF)
      assert(rows(ClusterCache.dsirDocStats(spark, sfDir, 4096, pred)) == builtD)
      // x25 over the LOADED doc-stats artifact is row-identical
      assert(rows(SparkEntry.queries("x25_dsir_weights")(spark, sfDir)) == builtX25)
    } finally { drop(); freshCaches() }
  }

  test("primeIfMissing writes only missing; stale corpus fingerprint forces rebuild") {
    import java.nio.file.{Files, Paths}
    sys.props.remove(IndexStore.EnvFlag) // the r14 default: auto-load
    freshCaches()
    // private corpus: spark-written DIRECTORY form (the generated-sf
    // shape), so a content change can be a new part file — real extra
    // rows, still-valid parquet
    val tmp = Files.createTempDirectory("gstale_corpus").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .write.parquet(s"$tmp/documents.parquet")
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .write.parquet(s"$tmp/embeddings.parquet")
    var primed: Seq[String] = Nil
    try {
      primed = IndexStore.primeIfMissing(spark, tmp)
      assert(primed.length == 22, s"expected all 22 written, got $primed")
      // everything present + valid -> second prime writes NOTHING
      assert(IndexStore.primeIfMissing(spark, tmp).isEmpty)
      assert(IndexStore.exists(spark, tmp, "docwordtf"))
      // parameter changes ride in the table NAME
      assert(IndexStore.tableName(tmp, "postings_n3")
        != IndexStore.tableName(tmp, "postings_n4"))
      // corpus-content change: duplicate a part file (count+bytes move)
      val fp1 = IndexStore.corpusFingerprint(spark, tmp)
      val part = new java.io.File(s"$tmp/documents.parquet").listFiles()
        .filter(_.getName.startsWith("part-")).head
      Files.copy(part.toPath,
        Paths.get(s"$tmp/documents.parquet/part-r14-extra.parquet"))
      assert(IndexStore.corpusFingerprint(spark, tmp) != fp1)
      // fresh-JVM simulation: catalog entries gone, only files remain
      primed.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
      freshCaches()
      // the stale manifest must NOT re-register ...
      assert(!IndexStore.exists(spark, tmp, "docwordtf"))
      // ... and the getter must REBUILD from the corpus, never serve
      // the stale table
      val plan = graft.dedup.ClusterCache.docWordTf(spark, tmp)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_idx"), "getter served a stale index table")
      // a legacy 2-line (pre-fingerprint) manifest is stale by definition
      val whDir = spark.conf.get("spark.sql.warehouse.dir")
        .replaceFirst("^file:", "")
      val mf = Paths.get(whDir, IndexStore.tableName(tmp, "docwordtf"),
        "_graft_index_meta.json")
      val lines = new String(Files.readAllBytes(mf), "UTF-8").split("\n", 3)
      Files.write(mf, (lines(0) + "\n" + lines(1)).getBytes("UTF-8"))
      // the nio write bypasses Hadoop's LocalFileSystem checksum — drop
      // the stale .crc sidecar so the manifest read sees the new bytes
      Files.deleteIfExists(mf.resolveSibling("." + mf.getFileName + ".crc"))
      assert(!IndexStore.exists(spark, tmp, "docwordtf"))
    } finally {
      primed.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
      freshCaches()
      val whDir = spark.conf.get("spark.sql.warehouse.dir")
        .replaceFirst("^file:", "")
      primed.foreach { n =>
        scala.reflect.io.Directory(new java.io.File(whDir, n)).deleteRecursively()
      }
      scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("kmeansCentroids: write-through self-prime, loaded == built, a7 transfers") {
    assert(CellIndexCache.kmeansCentroidsArtifact(8, 2) == "kmcents_k8_r2")
    sys.props(IndexStore.EnvFlag) = "0"
    freshCaches()
    val built = rows(CellIndexCache.kmeansCentroids(spark, sfDir, 8, 2))
    val builtA7 = rows(SparkEntry.queries("a7_kmeans")(spark, sfDir))
    assert(built.nonEmpty && builtA7.nonEmpty)
    sys.props.remove(IndexStore.EnvFlag)
    freshCaches()
    val art = CellIndexCache.kmeansCentroidsArtifact(8, 2)
    val name = IndexStore.tableName(sfDir, art)
    val whDir = spark.conf.get("spark.sql.warehouse.dir")
      .replaceFirst("^file:", "")
    def drop(): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      scala.reflect.io.Directory(new java.io.File(whDir, name)).deleteRecursively()
    }
    drop()
    try {
      // write-through self-prime on first touch; doubles round-trip
      // parquet bit-exactly so loaded == built
      assert(rows(CellIndexCache.kmeansCentroids(spark, sfDir, 8, 2)) == built)
      assert(IndexStore.exists(spark, sfDir, art), "write-through did not prime")
      freshCaches()
      assert(rows(CellIndexCache.kmeansCentroids(spark, sfDir, 8, 2)) == built)
      // the production query over the LOADED centroids is row-identical
      // → the committed oracle-green verdict transfers
      assert(rows(SparkEntry.queries("a7_kmeans")(spark, sfDir)) == builtA7)
    } finally { drop(); freshCaches() }
  }

  test("width-staleness: a grossly under-bucketed artifact re-primes (ADVICE r15)") {
    val df = spark.range(100).toDF("k")
      .select(col("k"), (col("k") % 7).as("v"))
    val art = "widthtest"
    val name = IndexStore.tableName(sfDir, art)
    def drop(): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val whDir = spark.conf.get("spark.sql.warehouse.dir")
        .replaceFirst("^file:", "")
      scala.reflect.io.Directory(new java.io.File(whDir, name)).deleteRecursively()
    }
    drop()
    try {
      sys.props("GRAFT_INDEX_BUCKETS") = "1"
      IndexStore.write(df, sfDir, art, Some("k"))
      spark.sql(s"DROP TABLE $name") // fresh-JVM simulation (files stay)
      // a same-width (or mildly wider) session keeps serving it
      assert(IndexStore.exists(spark, sfDir, art))
      spark.sql(s"DROP TABLE $name")
      sys.props("GRAFT_INDEX_BUCKETS") = "2"
      assert(IndexStore.exists(spark, sfDir, art)) // 1*4 >= 2: valid
      spark.sql(s"DROP TABLE $name")
      // a 4x+ wider session treats it as stale (never capped at the
      // narrow writer's width) ...
      sys.props("GRAFT_INDEX_BUCKETS") = "8"
      assert(!IndexStore.exists(spark, sfDir, art))
      // ... and loadOrWrite re-primes at the session width
      assert(IndexStore.loadOrWrite(spark, sfDir, art, Some("k"))(df)
        .count() == 100)
      spark.sql(s"DROP TABLE $name")
      assert(IndexStore.exists(spark, sfDir, art)) // recorded 8 now
    } finally { sys.props.remove("GRAFT_INDEX_BUCKETS"); drop() }
  }
}
