package graft.ann

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.sources.{ParquetStats, Tables}

/** Process-wide memo of built [[CoarseIndex]]es, keyed by (session,
  * corpus dir, cell size, salt). Four queries share one blocking
  * structure (d5/d8 near-dup, a3/a4 IVF); without the memo each ran
  * its own `count()` plus the full n·(k1+k2) anchor assignment — 4×
  * the same job per bench/verify pass (the round-7 a/d-family
  * regression). The assignment is persisted MEMORY_AND_DISK: ≤
  * 2·probe small rows per corpus row, far under the corpus itself.
  *
  * The corpus row count comes from parquet footers
  * ([[ParquetStats.rowCount]]), not a scan job. Entries from stopped
  * sessions are rebuilt transparently; `clear()` drops everything
  * (tests). */
object CellIndexCache {
  private case class Key(session: Int, dir: String, cellSize: Int, salt: String)
  private val cache = scala.collection.concurrent.TrieMap.empty[Key, CoarseIndex]

  /** The shared index over `dir`'s embeddings table. */
  def embeddings(spark: SparkSession, dir: String,
                 id: String = "vec_id", vec: String = "embedding",
                 targetCellSize: Int = Ann.DefaultTargetCellSize,
                 salt: String = Ann.CellSalt): CoarseIndex = {
    val key = Key(System.identityHashCode(spark), dir, targetCellSize, salt)
    def build(): CoarseIndex = {
      val n = ParquetStats.rowCount(spark, s"$dir/embeddings.parquet")
      val ix = Ann.buildCoarseIndex(Tables.embeddings(spark, dir), id, vec, n,
        targetCellSize, salt)
      ix.copy(asg = ix.asg.persist(StorageLevel.MEMORY_AND_DISK))
    }
    val ix = cache.getOrElseUpdate(key, build())
    if (ix.asg.sparkSession.sparkContext.isStopped) {
      // a test stopped the owning session; rebuild against the live one
      val fresh = build()
      cache.put(key, fresh)
      fresh
    } else ix
  }

  /** The base threshold the shared pair table is scored at — d5's
    * reporting tau. Any consumer with tau >= BaseTau is a FILTER of
    * this table: a pair's cosine is constant across its meeting
    * cells, so the tau predicate commutes with the min-cell/max-cos
    * aggregation (spec-checked in CoarseCellSpec). */
  val BaseTau = 0.25

  private val pairsCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame]

  /** Near-dup pairs over `dir`'s embeddings at [[BaseTau]], built on
    * the shared index and persisted — ONE pair-scoring job serves
    * d5 (identity) and d8 (cos >= 0.4 filter + connected components),
    * the way a real curation pipeline materializes its pair table
    * once and derives reports and clusters from it. */
  def scaledPairs(spark: SparkSession, dir: String,
                  id: String = "vec_id", vec: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val key = (System.identityHashCode(spark), dir)
    def build() = graft.sources.IndexStore.loadOr(spark, dir, "pairs") {
      Ann.nearDupPairsScaledIndexed(
          Tables.embeddings(spark, dir), id, vec, BaseTau, embeddings(spark, dir))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val df = pairsCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      pairsCache.put(key, fresh)
      fresh
    } else df
  }

  private val withCellCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame]

  /** The embeddings table with its primary coarse-cell column
    * attached, persisted — the (id, vector, cell) table a3/a4 probe,
    * built once per (session, dir) instead of re-running the
    * cellsFromIndex aggregation + join per query. */
  def embeddingsWithCell(spark: SparkSession, dir: String,
                         id: String = "vec_id", vec: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val key = (System.identityHashCode(spark), dir)
    def build() = graft.sources.IndexStore.loadOr(spark, dir, "cells") {
      Ann.withCoarseCellIndexed(
          Tables.embeddings(spark, dir), id, embeddings(spark, dir, id, vec))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val df = withCellCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      withCellCache.put(key, fresh)
      fresh
    } else df
  }

  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame]

  /** Decimal-exact per-cell centroids over [[embeddingsWithCell]],
    * persisted — the IVF coarse structure every a4-style probe
    * shares (one corpus-wide aggregation, many queries). */
  def centroids(spark: SparkSession, dir: String,
                id: String = "vec_id", vec: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val key = (System.identityHashCode(spark), dir)
    // the persisted table carries the extra g_grp bucketing column —
    // project it away so the loaded shape matches the built (c_cell,
    // c_vec) contract (and only in the load arm: a projection wrapper
    // around the built-and-persisted df would make clear()'s
    // unpersist a no-op)
    def build() =
      if (graft.sources.IndexStore.enabled &&
          graft.sources.IndexStore.exists(spark, dir, "centroids"))
        graft.sources.IndexStore.load(spark, dir, "centroids")
          .select(org.apache.spark.sql.functions.col("c_cell"),
            org.apache.spark.sql.functions.col("c_vec"))
      else Ann.ivfCentroids(embeddingsWithCell(spark, dir, id, vec), vec, "cell")
        .persist(StorageLevel.MEMORY_AND_DISK)
    val df = centroidCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      centroidCache.put(key, fresh)
      fresh
    } else df
  }

  private val groupCentroidCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame]

  /** Level-0 GROUP centroids over [[centroids]] (k1 tiny rows) — stage
    * 1 of the hierarchical coarse probe a4/a9 share. Derived from the
    * persisted cell-centroid table (one cells-row aggregation, never a
    * corpus scan) and persisted itself so a query batch pays neither. */
  def groupCentroids(spark: SparkSession, dir: String,
                     id: String = "vec_id", vec: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val key = (System.identityHashCode(spark), dir)
    def build() = graft.sources.IndexStore.loadOr(spark, dir, "gcents") {
      Ann.groupCentroids(centroids(spark, dir, id, vec),
          embeddings(spark, dir, id, vec).k2)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val df = groupCentroidCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      groupCentroidCache.put(key, fresh)
      fresh
    } else df
  }

  private val pqCodebookCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame]
  private val pqCodesCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame]

  /** The IVFPQ RESIDUAL codebook over `dir`'s embeddings (k·m tiny
    * rows, broadcast at use sites), memoized per (session, dir). */
  def pqCodebook(spark: SparkSession, dir: String,
                 id: String = "vec_id", vec: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val key = (System.identityHashCode(spark), dir)
    def build() = graft.sources.IndexStore.loadOr(spark, dir, "pqcodebook") {
      Ann.ivfPqCodebook(
          embeddingsWithCell(spark, dir, id, vec), id, vec, "cell",
          centroids(spark, dir, id, vec))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val df = pqCodebookCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      pqCodebookCache.put(key, fresh)
      fresh
    } else df
  }

  /** The IVFPQ inverted-list code table (c_cell, __vid, __m, __code)
    * over `dir`'s embeddings — residual-encoded, cell-indexed, the
    * compressed index a9's ADC scoring probes by cell key. ONE
    * corpus-scan encode per (session, dir), persisted: n·m narrow
    * integer rows, ~m bytes per vector. */
  def pqCodes(spark: SparkSession, dir: String,
              id: String = "vec_id", vec: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val key = (System.identityHashCode(spark), dir)
    def build() = graft.sources.IndexStore.loadOr(spark, dir, "pqcodes") {
      Ann.ivfPqCodes(
          embeddingsWithCell(spark, dir, id, vec), id, vec, "cell",
          centroids(spark, dir, id, vec),
          pqCodebook(spark, dir, id, vec))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val df = pqCodesCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      pqCodesCache.put(key, fresh)
      fresh
    } else df
  }

  private val rawPqCodebookCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame]
  private val rawPqCodesCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame]

  /** a8's RAW-vector PQ codebook (no coarse cells — standalone PQ),
    * memoized per (session, dir). */
  def rawPqCodebook(spark: SparkSession, dir: String,
                    id: String = "vec_id", vec: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val key = (System.identityHashCode(spark), dir)
    def build() = graft.sources.IndexStore.loadOr(spark, dir, "rawpqcodebook") {
      Ann.pqCodebook(Tables.embeddings(spark, dir), id, vec)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val df = rawPqCodebookCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      rawPqCodebookCache.put(key, fresh)
      fresh
    } else df
  }

  /** a8's RAW-vector PQ code table (__vid, __m, __code) — the
    * standalone-PQ compressed index, built ONCE per (session, dir)
    * (index construction vs search, the FAISS split); per-query a8
    * work is then the distance table + integer ADC join only. */
  def rawPqCodes(spark: SparkSession, dir: String,
                 id: String = "vec_id", vec: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val key = (System.identityHashCode(spark), dir)
    def build() = graft.sources.IndexStore.loadOr(spark, dir, "rawpqcodes") {
      Ann.pqCodes(Tables.embeddings(spark, dir), id, vec,
          rawPqCodebook(spark, dir, id, vec))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val df = rawPqCodesCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      rawPqCodesCache.put(key, fresh)
      fresh
    } else df
  }

  /** Unpersist and forget every cached index (test hygiene). */
  def clear(): Unit = {
    cache.values.foreach { ix =>
      if (!ix.asg.sparkSession.sparkContext.isStopped)
        ix.asg.unpersist()
    }
    cache.clear()
    Seq(pairsCache, withCellCache, centroidCache, groupCentroidCache,
        pqCodebookCache, pqCodesCache,
        rawPqCodebookCache, rawPqCodesCache).foreach { c =>
      c.values.foreach { df =>
        if (!df.sparkSession.sparkContext.isStopped) df.unpersist()
      }
      c.clear()
    }
  }
}
