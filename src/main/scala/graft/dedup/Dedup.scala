package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Document deduplication for training-data curation, at three cost
  * tiers:
  *
  *  1. exact: md5 content hash → groupBy — one shuffle on the hash, the
  *     text column is dropped before the exchange.
  *  2. near-dup, exact Jaccard: inverted-index self-join on shingles —
  *     candidate pairs only where at least one shingle is shared, never
  *     a cross join. Pair count is bounded by shingle co-occurrence.
  *  3. near-dup at scale: MinHash + banded LSH (round 2) — signature is
  *     a fixed small array, pairs come from band-bucket equality joins;
  *     this is the 100 TB path where materializing shingle postings is
  *     too wide.
  *
  * Hashing is md5 (portable to the DuckDB oracle); MinHash compares
  * fixed-width hex strings, whose lexicographic order equals numeric
  * order of the underlying 128-bit value.
  */
object Dedup {

  /** Exact-duplicate groups: content hash, canonical (min) id, group
    * size, member ids. */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), md5(col(text)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(
        min(col(id)).as("canonical_id"),
        count(lit(1)).as("n_docs"),
        concat_ws(",", sort_array(collect_list(col(id)))).as("doc_ids"))

  /** Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ tau).
    * Inverted-index join: explode distinct shingles AFTER projecting to
    * (id, shingle) so the raw text never enters the shuffle. */
  def ngramJaccardPairs(docs: DataFrame, id: String, text: String,
                        n: Int, tau: Double): DataFrame = {
    val sh = docs.select(col(id), Text.shingles(col(text), n).as("sh"))
      .select(col(id), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    val a = sh.select(col(id).as("id_a"), col("n_sh").as("n_a"), col("shingle"))
    val b = sh.select(col(id).as("id_b"), col("n_sh").as("n_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        round(col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")), 6))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "shared", "jaccard")
  }

  /** MinHash signature: for each of `perms` permutations, the minimum
    * md5 of (seed || shingle) as a fixed-width hex string. */
  def minhashSignature(shingleCol: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)),
      p => array_min(transform(shingleCol,
        s => md5(concat(p.cast("string"), lit("|"), s)))))

  /** Banded-LSH candidate pairs: docs sharing ≥1 identical band of the
    * MinHash signature. `perms` must be divisible by `bands`. One
    * explode to (band_idx, band_key) then a self-equi-join per bucket —
    * the scalable path: no pairwise comparison outside buckets. */
  def minhashLshPairs(docs: DataFrame, id: String, text: String,
                      n: Int, perms: Int, bands: Int): DataFrame = {
    val rows = perms / bands
    val sig = docs
      .select(col(id), Text.shingles(col(text), n).as("sh"))
      .select(col(id), minhashSignature(col("sh"), perms).as("sig"))
    val banded = sig.select(col(id), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws("", slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    val a = banded.select(col(id).as("id_a"), col("band"), col("band_key"))
    val b = banded.select(col(id).as("id_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .orderBy("id_a", "id_b")
  }
}
