package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decode / feature-extract stages as pure column expressions.
  *
  * The container ships no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (clearly marked below) — the Spark-side plumbing
  * (binary column handling, schema, partition-batched mapPartitions,
  * metadata extraction) is real and tested. In production the stub body
  * is replaced by the actual codec call; nothing else changes.
  */
object Binary {

  /** Attach a binary payload column (here: utf-8 bytes of the text —
    * the stand-in for image/audio bytes loaded via `binaryFile` source). */
  def withPayload(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), col(text).cast("binary").as("payload"))

  /** Pure-SQL metadata + stub-decoded dimensions: everything here is a
    * codegen'd expression (no UDF) and oracle-reproducible. The
    * width/height are the STUB — deterministic functions of the byte
    * length standing in for the real decoded dimensions. */
  def decodeMeta(withPayload: DataFrame, id: String): DataFrame =
    withPayload.select(
      col(id),
      octet_length(col("payload")).as("byte_len"),
      md5(col("payload")).as("checksum"),
      (octet_length(col("payload")) % 997).as("width"),     // STUB decode
      (octet_length(col("payload")) * 7 % 769).as("height") // STUB decode
    ).withColumn("n_tiles",
      ceil(col("width") / 64.0).cast("long") * ceil(col("height") / 64.0).cast("long"))

  /** Fixed-size chunking of a binary payload: (id, chunk_idx, bytes,
    * md5) rows, the shipping shape for large blobs (upload parts,
    * shard-to-GPU batches). Pure codegen'd expressions — `substr` on
    * the binary column inside a `transform(sequence(...))`, then
    * posexplode; the payload column itself is projected away before
    * any exchange, so only chunk-sized slices move. */
  def chunked(withPayload: DataFrame, id: String, chunkSize: Int): DataFrame = {
    val nChunks = ceil(octet_length(col("payload")).cast("double") / chunkSize)
      .cast("int")
    // nChunks=0 must yield NO rows — an unguarded sequence(0, -1) would
    // count DOWN and posexplode two phantom chunks for an empty payload
    val idxs = when(nChunks <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nChunks - 1))
    withPayload
      .select(col(id), posexplode(transform(idxs,
        i => substring(col("payload"), (i * chunkSize) + 1, lit(chunkSize)))))
      .select(col(id), col("pos").as("chunk_idx"),
        octet_length(col("col")).as("chunk_len"), md5(col("col")).as("chunk_md5"))
  }

  /** Chunk-level near-dup pairs over binary payloads — the STORAGE
    * dedup a multimodal lake runs on opaque blobs (image/video/audio
    * files whose bytes, not semantics, repeat): payloads are cut into
    * fixed `chunkSize`-byte chunks (the aligned-store case; a
    * content-defined rolling-hash chunker is the unaligned extension
    * with the same downstream plan), each chunk keyed by its md5, and
    * two payloads pair when the Jaccard overlap of their DISTINCT
    * chunk-key sets reaches `tau`. The pair plan IS the d4 postings
    * machinery ([[graft.dedup.Dedup.jaccardDirect]]) over chunk keys
    * instead of shingles — candidates only where a chunk is shared,
    * never all-pairs, and the payload bytes never enter the exchange
    * (only 64-bit key prefixes and counts do). */
  def chunkDupPairs(withPayload: DataFrame, id: String,
                    chunkSize: Int, tau: Double): DataFrame = {
    // distinct keys + a count join, never a per-payload buffer: a
    // single blob can carry millions of chunks at lake scale, so no
    // collect_set / window may materialize one payload's key set
    val keys = chunked(withPayload, id, chunkSize)
      .select(col(id), graft.functions.Text.md5Prefix60(col("chunk_md5")).as("__ck"))
      .distinct()
    val counts = keys.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    val postings = keys.join(counts, id)
      .select(col(id), col("n_sh"), col("__ck").as("shingle"))
    graft.dedup.Dedup.jaccardDirect(postings, tau)
  }

  /** Frame sampling: every `stride`-th byte as a "frame", with count /
    * sum / head-of-stream per document. STUB: a real impl decodes
    * containers and samples frames; the sampling arithmetic, schema and
    * per-doc aggregation shape are the real plumbing.
    *
    * Expressed entirely as array expressions (sequence → transform →
    * aggregate, the m3 pattern) rather than `mapPartitions`: no
    * Dataset[T] round-trip, so the plan has no
    * SerializeFromObject/DeserializeToObject barrier and the operator
    * composes with pushdown/pruning like any other projection. ASCII
    * payloads make `substr` on the text column byte-accurate (same
    * convention as `chunked`). */
  def frameSample(docs: DataFrame, id: String, text: String,
                  stride: Int): DataFrame = {
    val nFrames = ceil(length(col(text)).cast("double") / stride).cast("int")
    // nFrames=0 must yield an EMPTY frame list (sequence(0,-1) counts down)
    val idxs = when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nFrames - 1))
    val frames = transform(idxs,
      i => ascii(col(text).substr(i * stride + lit(1), lit(1))))
    docs.select(col(id).cast("long").as(id),
        frames.as("__frames"))
      .select(col(id),
        size(col("__frames")).cast("long").as("n_frames"),
        aggregate(col("__frames"), lit(0L), (acc, x) => acc + x).as("frame_sum"),
        concat_ws(",", slice(col("__frames"), 1, 8)).as("head_frames"))
  }
}
