package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import graft.sources.Tables

/** One MinHash-LSH + connected-components clustering job per
  * (session, corpus dir, parameters), shared by every consumer —
  * d6 reports the cluster table itself, d7 derives survivorship from
  * it. Same shape as [[graft.ann.CellIndexCache]] for the embedding
  * family: a real curation pipeline materializes its text dup-cluster
  * table once and hangs reports, survivorship, and filtering off it,
  * instead of re-running the LSH band join and the O(log n)
  * star-contraction rounds per downstream query.
  */
object ClusterCache {
  private case class Key(session: Int, dir: String, n: Int, perms: Int, bands: Int)
  private val pairCache = scala.collection.concurrent.TrieMap.empty[Key, DataFrame]
  private val cache = scala.collection.concurrent.TrieMap.empty[Key, DataFrame]
  private val postingsCache = scala.collection.concurrent.TrieMap.empty[Key, DataFrame]
  private val dfCache = scala.collection.concurrent.TrieMap.empty[Key, DataFrame]
  private val statsCache = scala.collection.concurrent.TrieMap.empty[Key, Dedup.DfSkewStats]

  private val docWordCache = scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  /** The shared (doc_id, term, tf) token aggregate over `dir`'s
    * documents — the table x11 (unigram LM), x14 (CCNet buckets) and
    * x17 (tf-idf top-k) all start from. One explode + aggregation per
    * corpus, persisted; each consumer pays only its own downstream
    * (Catalyst cannot share the differently-pruned branches between
    * consumers OR within one — see Pipeline.docWordTf). */
  def docWordTf(spark: SparkSession, dir: String): DataFrame = {
    val key = (System.identityHashCode(spark), dir)
    def build(): DataFrame =
      graft.sources.IndexStore.loadOr(spark, dir, "docwordtf") {
        graft.operators.Pipeline.docWordTable(
            Tables.documents(spark, dir), "doc_id", "text")
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    val df = docWordCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      docWordCache.put(key, fresh)
      fresh
    } else df
  }

  /** The shared (doc_id, n_sh, shingle-hash) postings table over
    * `dir`'s documents — the input both exact-similarity measures
    * (d4 Jaccard, x16 containment) join on. One shingle + md5 build
    * per corpus, persisted; each consumer pays only its own join. */
  def postings(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val key = Key(System.identityHashCode(spark), dir, n, 0, 0)
    def build(): DataFrame =
      graft.sources.IndexStore.loadOr(spark, dir, s"postings_n$n") {
        Dedup.shinglePostings(Tables.documents(spark, dir), "doc_id", "text", n)
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    val df = postingsCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      postingsCache.put(key, fresh)
      fresh
    } else df
  }

  /** The shared per-shingle document-frequency table (shingle, __df)
    * over [[postings]] — vocabulary-sized (tiny next to the postings
    * themselves), persisted. One postings-wide aggregation serves
    * every df consumer per corpus: both adaptive routers' skew
    * statistics (d4 Jaccard, x16 containment), the prefix arms'
    * global (df, shingle) rank order, and the df>=2 unique-shingle
    * prune — without it each of those recomputes the same groupBy
    * from the postings (three full-width aggregations inside one x16
    * call; measured +1.3s on a 0.3s sf0.1 query). */
  def shingleDf(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val key = Key(System.identityHashCode(spark), dir, n, 0, 0)
    def build(): DataFrame =
      graft.sources.IndexStore.loadOr(spark, dir, s"shingledf_n$n") {
        Dedup.shingleDf(postings(spark, dir, n))
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    val df = dfCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      dfCache.put(key, fresh)
      fresh
    } else df
  }

  /** The df-distribution routing statistics over [[shingleDf]] —
    * tau-independent, so ONE two-action computation per corpus serves
    * every adaptive-router consumer (d4 Jaccard, x16 containment):
    * re-running the stats per query costs ~0.3s of pure
    * job-scheduling latency at local[32] even against the persisted
    * df table. Memoized as a plain value (a few longs), not a
    * DataFrame. */
  def dfSkewStats(spark: SparkSession, dir: String,
                  n: Int = 3): Dedup.DfSkewStats = {
    val key = Key(System.identityHashCode(spark), dir, n, 0, 0)
    statsCache.getOrElseUpdate(key, Dedup.dfSkewStats(shingleDf(spark, dir, n)))
  }

  /** The shared MinHash-LSH candidate pair table (id_a, id_b) over
    * `dir`'s documents, persisted — d2 reports it (plus its orderBy),
    * the cluster build consumes it as the CC edge set. One signature +
    * band-join job, every consumer. */
  def minhashPairs(spark: SparkSession, dir: String,
                   n: Int = 3, perms: Int = 16, bands: Int = 4): DataFrame = {
    val key = Key(System.identityHashCode(spark), dir, n, perms, bands)
    def build(): DataFrame =
      graft.sources.IndexStore.loadOr(spark, dir, s"minhash_n${n}_p${perms}_b$bands") {
        Dedup.minhashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
            n, perms, bands, ordered = false)
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    val df = pairCache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      val fresh = build()
      pairCache.put(key, fresh)
      fresh
    } else df
  }

  /** The shared dup-cluster table over `dir`'s documents table
    * (doc_id, cluster_id), persisted MEMORY_AND_DISK — connected
    * components over [[minhashPairs]]' edge set, so the LSH job is
    * shared with d2 and the CC rounds with d7. */
  def documents(spark: SparkSession, dir: String,
                n: Int = 3, perms: Int = 16, bands: Int = 4): DataFrame = {
    val key = Key(System.identityHashCode(spark), dir, n, perms, bands)
    def build(): DataFrame =
      graft.sources.IndexStore.loadOr(spark, dir, s"clusters_n${n}_p${perms}_b$bands") {
        Dedup.connectedComponents(
            Tables.documents(spark, dir).select(org.apache.spark.sql.functions.col("doc_id")),
            minhashPairs(spark, dir, n, perms, bands), "doc_id")
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    val df = cache.getOrElseUpdate(key, build())
    if (df.sparkSession.sparkContext.isStopped) {
      // a test stopped the owning session; rebuild against the live one
      val fresh = build()
      cache.put(key, fresh)
      fresh
    } else df
  }

  /** Unpersist and forget every cached cluster table (test hygiene). */
  def clear(): Unit = {
    Seq(cache, pairCache, postingsCache, dfCache).foreach { c =>
      c.values.foreach { df =>
        if (!df.sparkSession.sparkContext.isStopped) df.unpersist()
      }
      c.clear()
    }
    docWordCache.values.foreach { df =>
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist()
    }
    docWordCache.clear()
    statsCache.clear()
  }
}
