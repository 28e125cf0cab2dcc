package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables
import graft.util.SessionCache

/** The shared fixed-size chunk table (doc_id, chunk_idx, chunk_len,
  * chunk_md5) over `dir`'s documents' binary payloads — the input both
  * storage-layer dedup reports start from (m4's chunk-key Jaccard
  * pairs, m6's CAS accounting). One payload explode per (corpus,
  * chunkSize), durable and size-stamped like ClusterCache.postings:
  * at lake scale each re-derivation is a full corpus pass over the
  * payload bytes, and the r17 localCheckpoint negative rules out
  * fixing the repeat with a query-path materialization action — the
  * durable-artifact path is the one that leaves the bench honest
  * (build mode re-derives everything; the BUILD gate stays green).
  */
object ChunkCache {
  private val cache = SessionCache.forDf[(Int, String, Int)]

  /** Size-stamped artifact name (chunkSize is part of the identity —
    * a different chunking is a different table). */
  def chunksArtifact(chunkSize: Int): String = s"chunks_c$chunkSize"

  def chunks(spark: SparkSession, dir: String, chunkSize: Int): DataFrame =
    cache.getOrBuild((System.identityHashCode(spark), dir, chunkSize)) {
      graft.sources.IndexStore.loadOr(spark, dir, chunksArtifact(chunkSize)) {
        import org.apache.spark.sql.functions.col
        // the tenant column rides the artifact (attached ONCE at build
        // time, doc-keyed 1:1): m6's per-source accounting would
        // otherwise re-join a documents projection per consuming leg;
        // m4 prunes it at the bucketed scan
        Binary.chunked(
            Binary.withPayload(Tables.documents(spark, dir), "doc_id", "text"),
            "doc_id", chunkSize)
          .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
            Seq("doc_id"))
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }

  /** Unpersist and forget every cached chunk table (test hygiene). */
  def clear(): Unit = cache.clear()
}
