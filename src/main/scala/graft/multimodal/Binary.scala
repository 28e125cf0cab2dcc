package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decode / feature-extract stages as per-partition batch transforms.
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

  /** Frame sampling over the binary payload via mapPartitions — the
    * batch shape a real video/audio decoder needs (one codec init per
    * partition, streaming over rows). Samples every `stride`-th byte as
    * a "frame". STUB: real impl would decode containers/frames. */
  def frameSample(spark: SparkSession, docs: DataFrame, id: String,
                  text: String, stride: Int): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      withPayload(docs, id, text)
        .select(col(id).cast("long"), col("payload"))
        .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      // per-partition init would happen here (codec handle, model, ...)
      it.map { case (docId, bytes) =>
        val frames = bytes.indices.by(stride).map(bytes(_).toInt & 0xff)
        (docId, frames.length.toLong, frames.map(_.toLong).sum,
          frames.take(8).mkString(","))
      }
    }.toDF(id, "n_frames", "frame_sum", "head_frames")
  }
}
