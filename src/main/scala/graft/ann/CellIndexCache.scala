package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import graft.sources.{ParquetStats, Tables}
import graft.util.SessionCache

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
  private val cache = new SessionCache[Key, CoarseIndex](
    ix => !ix.asg.sparkSession.sparkContext.isStopped,
    ix => { ix.asg.unpersist(); () })

  /** The shared index over `dir`'s embeddings table. */
  def embeddings(spark: SparkSession, dir: String,
                 id: String = "vec_id", vec: String = "embedding",
                 targetCellSize: Int = Ann.DefaultTargetCellSize,
                 salt: String = Ann.CellSalt): CoarseIndex =
    cache.getOrBuild(Key(System.identityHashCode(spark), dir, targetCellSize, salt)) {
      val n = ParquetStats.rowCount(spark, s"$dir/embeddings.parquet")
      val ix = Ann.buildCoarseIndex(Tables.embeddings(spark, dir), id, vec, n,
        targetCellSize, salt)
      ix.copy(asg = ix.asg.persist(StorageLevel.MEMORY_AND_DISK))
    }

  /** The base threshold the shared pair table is scored at — d5's
    * reporting tau. Any consumer with tau >= BaseTau is a FILTER of
    * this table: a pair's cosine is constant across its meeting
    * cells, so the tau predicate commutes with the min-cell/max-cos
    * aggregation (spec-checked in CoarseCellSpec). */
  val BaseTau = 0.25

  private val sq8Cache =
    new SessionCache[(Int, String), (Array[Double], Array[Double])](
      _ => true, _ => ())

  /** The SQ8 quantizer's per-dimension (mins, maxs) over `dir`'s
    * embeddings — ONE training scan per (session, corpus), shared by
    * every SQ8 consumer (a15's quantize leg and its recall eval). The
    * cached value is 2·dims doubles (plain data — no session-owned
    * resources to release), keyed by session only so two live sessions
    * never share a driver-collected artifact. */
  def sq8Stats(spark: SparkSession, dir: String,
               id: String = "vec_id", vec: String = "embedding")
      : (Array[Double], Array[Double]) =
    sq8Cache.getOrBuild((System.identityHashCode(spark), dir)) {
      val emb = Tables.embeddings(spark, dir)
      val dims = emb.selectExpr(s"size($vec)").head().getInt(0)
      Ann.sq8MinMax(emb, vec, dims)
    }

  private val pairsCache = SessionCache.forDf[(Int, String)]

  /** Near-dup pairs over `dir`'s embeddings at [[BaseTau]], built on
    * the shared index and persisted — ONE pair-scoring job serves
    * d5 (identity) and d8 (cos >= 0.4 filter + connected components),
    * the way a real curation pipeline materializes its pair table
    * once and derives reports and clusters from it. */
  def scaledPairs(spark: SparkSession, dir: String,
                  id: String = "vec_id", vec: String = "embedding"): DataFrame =
    pairsCache.getOrBuild((System.identityHashCode(spark), dir)) {
      graft.sources.IndexStore.loadOr(spark, dir, "pairs") {
        Ann.nearDupPairsScaledIndexed(
            Tables.embeddings(spark, dir), id, vec, BaseTau, embeddings(spark, dir))
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  private val sclusterCache = SessionCache.forDf[(Int, String, Int)]

  /** τ-stamped artifact name for [[semanticClusters]]. */
  def semanticClustersArtifact(tau: Double): String =
    s"sclusters_t${math.round(tau * 10000)}"

  /** The SEMANTIC dup-cluster assignment (vec_id, cluster_id) —
    * connected components over [[scaledPairs]] filtered at `tau` — as
    * a durable τ-stamped artifact (the dedup ClusterCache pattern
    * applied to the embedding side): the O(log n) star-contraction
    * rounds are the costliest per-session work left in the d8 path
    * and are a pure function of (corpus, τ), so they run once per
    * corpus and every later session loads the bucketed assignment.
    * Write-through self-priming; fingerprint-invalidated. */
  def semanticClusters(spark: SparkSession, dir: String,
                       tau: Double): DataFrame =
    sclusterCache.getOrBuild(
        (System.identityHashCode(spark), dir, math.round(tau * 10000).toInt)) {
      graft.sources.IndexStore.loadOrWrite(spark, dir,
          semanticClustersArtifact(tau), Some("cluster_id")) {
        import org.apache.spark.sql.functions.col
        graft.dedup.Dedup.connectedComponents(
            Tables.embeddings(spark, dir).select(col("vec_id")),
            scaledPairs(spark, dir).filter(col("cos") >= tau)
              .select(col("id_a"), col("id_b")),
            "vec_id")
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  /** Parameter-stamped artifact name for [[kmeansCentroids]]. */
  def kmeansCentroidsArtifact(k: Int, rounds: Int): String =
    s"kmcents_k${k}_r$rounds"

  private val kmCentCache = SessionCache.forDf[(Int, String, Int, Int)]

  /** a7's trained Lloyd centroids (c_cell, c_vec) as a durable
    * parameter-stamped artifact: the training is deterministic
    * (seeded, decimal-exact means — [[Ann.kmeansCentroids]]) and
    * corpus-pure, so a warm session loads the k-row table instead of
    * re-running rounds+1 corpus scans (the costliest non-drain batch
    * key at sf1 pre-r16). Plain table (k rows — nothing to bucket);
    * write-through self-priming; fingerprint-invalidated. */
  def kmeansCentroids(spark: SparkSession, dir: String, k: Int,
                      rounds: Int): DataFrame =
    kmCentCache.getOrBuild(
        (System.identityHashCode(spark), dir, k, rounds)) {
      graft.sources.IndexStore.loadOrWrite(spark, dir,
          kmeansCentroidsArtifact(k, rounds), None) {
        Ann.kmeansCentroids(Tables.embeddings(spark, dir),
            "vec_id", "embedding", k, rounds)
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  private val withCellCache = SessionCache.forDf[(Int, String)]

  /** The embeddings table with its primary coarse-cell column
    * attached, persisted — the (id, vector, cell) table a3/a4 probe,
    * built once per (session, dir) instead of re-running the
    * cellsFromIndex aggregation + join per query. */
  def embeddingsWithCell(spark: SparkSession, dir: String,
                         id: String = "vec_id", vec: String = "embedding"): DataFrame =
    withCellCache.getOrBuild((System.identityHashCode(spark), dir)) {
      graft.sources.IndexStore.loadOr(spark, dir, "cells") {
        Ann.withCoarseCellIndexed(
            Tables.embeddings(spark, dir), id, embeddings(spark, dir, id, vec))
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  /** The shared (id, vec, cell) table when it is already session-warm
    * or loadable as a durable artifact — else None. Callers that do
    * not NEED the cell column (a7's kmeans report scan reads the same
    * rows; the column is unused) fall back to the raw corpus scan
    * instead of paying the full coarse-cell construction in a cold
    * build-mode session (ADVICE r16). In suite context the a-family
    * primes the artifact anyway, so the shared in-RAM table is what
    * this returns. */
  def embeddingsWithCellIfWarm(spark: SparkSession,
                               dir: String): Option[DataFrame] =
    withCellCache.peek((System.identityHashCode(spark), dir))
      .orElse {
        if (graft.sources.IndexStore.enabled &&
            graft.sources.IndexStore.exists(spark, dir, "cells"))
          Some(embeddingsWithCell(spark, dir))
        else None
      }

  private val centroidCache = SessionCache.forDf[(Int, String)]

  /** Decimal-exact per-cell centroids over [[embeddingsWithCell]],
    * persisted — the IVF coarse structure every a4-style probe
    * shares (one corpus-wide aggregation, many queries). */
  def centroids(spark: SparkSession, dir: String,
                id: String = "vec_id", vec: String = "embedding"): DataFrame =
    centroidCache.getOrBuild((System.identityHashCode(spark), dir)) {
      // the persisted table carries the extra g_grp bucketing column —
      // project it away so the loaded shape matches the built (c_cell,
      // c_vec) contract (and only in the load arm: a projection wrapper
      // around the built-and-persisted df would make clear()'s
      // unpersist a no-op)
      if (graft.sources.IndexStore.enabled &&
          graft.sources.IndexStore.exists(spark, dir, "centroids"))
        graft.sources.IndexStore.load(spark, dir, "centroids")
          .select(org.apache.spark.sql.functions.col("c_cell"),
            org.apache.spark.sql.functions.col("c_vec"))
      else Ann.ivfCentroids(embeddingsWithCell(spark, dir, id, vec), vec, "cell")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private val groupCentroidCache = SessionCache.forDf[(Int, String)]

  /** Level-0 GROUP centroids over [[centroids]] (k1 tiny rows) — stage
    * 1 of the hierarchical coarse probe a4/a9 share. Derived from the
    * persisted cell-centroid table (one cells-row aggregation, never a
    * corpus scan) and persisted itself so a query batch pays neither. */
  def groupCentroids(spark: SparkSession, dir: String,
                     id: String = "vec_id", vec: String = "embedding"): DataFrame =
    groupCentroidCache.getOrBuild((System.identityHashCode(spark), dir)) {
      graft.sources.IndexStore.loadOr(spark, dir, "gcents") {
        Ann.groupCentroids(centroids(spark, dir, id, vec),
            embeddings(spark, dir, id, vec).k2)
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  private val pqCodebookCache = SessionCache.forDf[(Int, String)]
  private val pqCodesCache = SessionCache.forDf[(Int, String)]

  /** The IVFPQ RESIDUAL codebook over `dir`'s embeddings (k·m tiny
    * rows, broadcast at use sites), memoized per (session, dir). */
  def pqCodebook(spark: SparkSession, dir: String,
                 id: String = "vec_id", vec: String = "embedding"): DataFrame =
    pqCodebookCache.getOrBuild((System.identityHashCode(spark), dir)) {
      graft.sources.IndexStore.loadOr(spark, dir, "pqcodebook") {
        Ann.ivfPqCodebook(
            embeddingsWithCell(spark, dir, id, vec), id, vec, "cell",
            centroids(spark, dir, id, vec))
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  /** The IVFPQ inverted-list code table (c_cell, __vid, __m, __code)
    * over `dir`'s embeddings — residual-encoded, cell-indexed, the
    * compressed index a9's ADC scoring probes by cell key. ONE
    * corpus-scan encode per (session, dir), persisted: n·m narrow
    * integer rows, ~m bytes per vector. */
  def pqCodes(spark: SparkSession, dir: String,
              id: String = "vec_id", vec: String = "embedding"): DataFrame =
    pqCodesCache.getOrBuild((System.identityHashCode(spark), dir)) {
      graft.sources.IndexStore.loadOr(spark, dir, "pqcodes") {
        Ann.ivfPqCodes(
            embeddingsWithCell(spark, dir, id, vec), id, vec, "cell",
            centroids(spark, dir, id, vec),
            pqCodebook(spark, dir, id, vec))
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  private val rawPqCodebookCache = SessionCache.forDf[(Int, String)]
  private val rawPqCodesCache = SessionCache.forDf[(Int, String)]

  /** a8's RAW-vector PQ codebook (no coarse cells — standalone PQ),
    * memoized per (session, dir). */
  def rawPqCodebook(spark: SparkSession, dir: String,
                    id: String = "vec_id", vec: String = "embedding"): DataFrame =
    rawPqCodebookCache.getOrBuild((System.identityHashCode(spark), dir)) {
      graft.sources.IndexStore.loadOr(spark, dir, "rawpqcodebook") {
        Ann.pqCodebook(Tables.embeddings(spark, dir), id, vec)
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  /** a8's RAW-vector PQ code table (__vid, __m, __code) — the
    * standalone-PQ compressed index, built ONCE per (session, dir)
    * (index construction vs search, the FAISS split); per-query a8
    * work is then the distance table + integer ADC join only. */
  def rawPqCodes(spark: SparkSession, dir: String,
                 id: String = "vec_id", vec: String = "embedding"): DataFrame =
    rawPqCodesCache.getOrBuild((System.identityHashCode(spark), dir)) {
      graft.sources.IndexStore.loadOr(spark, dir, "rawpqcodes") {
        Ann.pqCodes(Tables.embeddings(spark, dir), id, vec,
            rawPqCodebook(spark, dir, id, vec))
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  /** a4's 2-stage hierarchical IVF top-k search over this cache's
    * shared artifacts — the ONE wiring of knnIvfProbeHier to the
    * production cells/centroids/group-centroids, so every consumer
    * (a4's search, a12's recall eval, a13's hybrid dense leg) probes
    * identically. Per-query SEARCH work, deliberately NOT memoized
    * here: callers that want a materialized candidate table cache the
    * bounded result themselves (RetrievalCache.ivfLeg). */
  def probeTopk(spark: SparkSession, dir: String, queryIds: Seq[Long],
                k: Int): DataFrame = {
    val ix = embeddings(spark, dir)
    Ann.knnIvfProbeHier(
      embeddingsWithCell(spark, dir), "vec_id", "embedding", "cell",
      centroids(spark, dir), ix.k2, queryIds, k,
      Ann.recommendedNprobe(ix.k1.toLong * ix.k2),
      Ann.recommendedGroupProbe(ix.k1),
      Some(groupCentroids(spark, dir)))
  }

  /** Unpersist and forget every cached index (test hygiene). */
  /** Result card of [[appendVectorDelta]] — delta size, the grown
    * occupancy profile, and the a10-style drift flag. */
  final case class AppendReport(deltaRows: Long, totalRows: Long,
                                k1: Int, k2: Int,
                                maxOcc: Long, meanOcc: Double,
                                imbalance: Double, pqSkipped: Long,
                                structureDrift: Boolean,
                                rebuildRecommended: Boolean)

  /** Occupancy-imbalance threshold above which [[appendVectorDelta]]
    * recommends a full rebuild: target cell size is ~64, so an 8×-mean
    * hottest cell means the frozen coarse structure has drifted enough
    * that in-cell work (d5 pairs, a3/a4 candidate scans) is
    * straggler-bound and re-anchoring pays. */
  val AppendImbalanceThreshold = 8.0

  /** INCREMENTAL index append (the FAISS add-with-frozen-quantizer
    * shape): fold the corpus rows that are NOT yet in the durable
    * vector index into it, without retraining — a production corpus
    * GROWS, and before this path any new batch invalidated the corpus
    * fingerprint and rebuilt all 21 artifacts from scratch.
    *
    *  1. The FROZEN anchor set is reconstructed from the stored cells
    *     table itself (anchors are the k1+k2 old-corpus rows with the
    *     smallest md5(salt:id) — Ann.anchorsOf is a pure function of
    *     the stored (id, vec) rows), so no separate anchors artifact
    *     is needed and existing deployments migrate as-is.
    *  2. delta = current corpus ANTI-JOIN indexed ids (one id-only
    *     probe of the corpus — the unavoidable delta discovery).
    *  3. delta rows are assigned to cells against the frozen anchors
    *     (ONE broadcast join over the delta — bit-identical
    *     tie-breaking to the build, Ann.assignToAnchors) and appended
    *     to the cells table; PQ codes are encoded against the FROZEN
    *     codebooks/centroids and appended to pqcodes/rawpqcodes.
    *  4. Frozen-but-still-valid artifacts (centroids, gcents,
    *     codebooks) get their manifest fingerprint refreshed; pair/
    *     cluster artifacts (pairs, sclusters, kmcents) are left
    *     fingerprint-stale ON PURPOSE — new pairs involve old rows,
    *     so they rebuild on next use (over the already-appended cells
    *     table).
    *  5. The a10-style occupancy card runs over the grown cells table;
    *     imbalance > [[AppendImbalanceThreshold]] flags
    *     rebuildRecommended (the drift gate — append keeps working,
    *     the caller schedules the retrain).
    *
    * Delta rows landing in a cell that had NO old occupants have no
    * cell centroid → no residual PQ code (counted in `pqSkipped`);
    * a3's cell join still finds them, and a4/a9 never probe
    * centroid-less cells by construction, so search behavior stays
    * consistent. Session caches are cleared at the end so later
    * queries in this session see the grown tables. */
  def appendVectorDelta(spark: SparkSession, dir: String,
                        id: String = "vec_id", vec: String = "embedding",
                        targetCellSize: Int = Ann.DefaultTargetCellSize,
                        salt: String = Ann.CellSalt,
                        imbalanceThreshold: Double = AppendImbalanceThreshold)
      : AppendReport = {
    import org.apache.spark.sql.functions._
    val store = graft.sources.IndexStore
    val frozen = Seq("centroids", "gcents", "pqcodebook", "rawpqcodebook")
    val appended = Seq("cells", "pqcodes", "rawpqcodes")
    try {
      val cellsOld = store.loadStale(spark, dir, "cells").getOrElse(
        sys.error(s"appendVectorDelta: no durable cells index under $dir — " +
          "build one first (IndexStore.writeAll / primeIfMissing)"))
      val nOld = cellsOld.count()
      val (k1, k2) = Ann.coarseCellParams(nOld, targetCellSize)
      // localCheckpoint, not persist: inserting into the cells table
      // below INVALIDATES every cached plan that reads that table
      // (Spark's CacheManager recursively uncaches dependents on a
      // table write), and a mere persist would silently recompute the
      // anti-join against the GROWN table — an empty delta. The
      // checkpoint severs the lineage, so the pre-append row sets
      // survive the write. Both are delta/k-sized, never corpus-sized.
      val anchors = Ann.anchorsOf(
        cellsOld.select(col(id), col(vec)), id, vec, k1, k2, salt)
        .localCheckpoint()
      val delta = Tables.embeddings(spark, dir)
        .join(cellsOld.select(col(id)), Seq(id), "left_anti")
        .localCheckpoint()
      val deltaRows = delta.count()
        var pqSkipped = 0L
        if (deltaRows > 0) {
          val deltaCell = Ann.assignToAnchors(delta, id, vec, anchors, 1)
            .groupBy(col(id))
            .agg((max(when(col("lvl") === 0, col("idx"))).cast("long") * k2 +
              max(when(col("lvl") === 1, col("idx"))).cast("long")).as("cell"))
          val deltaWithCell = delta.join(deltaCell, id)
            .localCheckpoint()
          val cellCols = spark.table(store.tableName(dir, "cells")).columns
          store.appendRows(spark, dir, "cells",
            deltaWithCell.select(cellCols.map(col): _*))
          // IVFPQ residual codes against the FROZEN centroids/codebook
          (store.loadStale(spark, dir, "centroids"),
              store.loadStale(spark, dir, "pqcodebook"),
              store.loadStale(spark, dir, "pqcodes")) match {
            case (Some(cents), Some(cb), Some(_)) =>
              val c2 = cents.select(col("c_cell"), col("c_vec"))
              val codes = Ann.ivfPqCodes(deltaWithCell, id, vec, "cell", c2, cb)
              val codeCols = spark.table(store.tableName(dir, "pqcodes")).columns
              // packed codes: exactly one row per encoded vector
              pqSkipped = deltaRows - codes.count()
              store.appendRows(spark, dir, "pqcodes",
                codes.select(codeCols.map(col): _*))
            case _ => ()
          }
          // raw (cell-free) PQ codes against the frozen raw codebook
          (store.loadStale(spark, dir, "rawpqcodebook"),
              store.loadStale(spark, dir, "rawpqcodes")) match {
            case (Some(rcb), Some(_)) =>
              val rcodes = Ann.pqCodes(delta, id, vec, rcb)
              val rCols = spark.table(store.tableName(dir, "rawpqcodes")).columns
              store.appendRows(spark, dir, "rawpqcodes",
                rcodes.select(rCols.map(col): _*))
            case _ => ()
          }
        } else {
          // nothing to fold in — just stamp the appendable artifacts
          appended.foreach { a =>
            if (store.loadStale(spark, dir, a).isDefined)
              store.refreshManifest(spark, dir, a)
          }
        }
        frozen.foreach { a =>
          if (store.loadStale(spark, dir, a).isDefined)
            store.refreshManifest(spark, dir, a)
        }
        // a10-style occupancy drift card over the GROWN cells table
        val occ = spark.table(store.tableName(dir, "cells"))
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n")).cast("long").as("total"),
            max(col("n")).cast("long").as("mx"),
            avg(col("n")).as("mean"))
          .head()
        val (total, mx, mean) =
          (occ.getLong(0), occ.getLong(1), occ.getDouble(2))
        val imbalance = if (mean > 0) mx / mean else 0.0
        // STRUCTURE drift: a4/a9 derive their probe constants (k2,
        // nprobe, group probe) from the CURRENT corpus size at query
        // time — if the grown corpus now implies a different (k1, k2)
        // than the frozen cells were built with, the probe constants
        // and the loaded centroids' g_grp grouping no longer agree,
        // and a retrain is due regardless of occupancy balance.
        val (k1g, k2g) = Ann.coarseCellParams(total, targetCellSize)
        val drift = (k1g, k2g) != (k1, k2)
        AppendReport(deltaRows, total, k1, k2, mx, mean, imbalance,
          pqSkipped, drift, drift || imbalance > imbalanceThreshold)
    } catch {
      case e: Throwable =>
        // undo the freshness-bypass registrations for anything not
        // migrated — a stale table must not masquerade as fresh
        (frozen ++ appended).foreach { a =>
          try store.dropRegistration(spark, dir, a) catch { case _: Throwable => () }
        }
        throw e
    } finally {
      // later queries in this session must see the grown tables, not
      // pre-append memos
      clear()
    }
  }

  def clear(): Unit = {
    cache.clear()
    Seq(pairsCache, withCellCache, centroidCache, groupCentroidCache,
        pqCodebookCache, pqCodesCache,
        rawPqCodebookCache, rawPqCodesCache).foreach(_.clear())
    sclusterCache.clear()
    kmCentCache.clear()
  }
}
