package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location: persist a fact table hash-bucketed (and
  * sorted) by its join/grouping key so later joins and aggregations on
  * that key read pre-partitioned data — the Exchange disappears from
  * the plan entirely. At 100 TB this is the difference between
  * re-shuffling the fact on every query and shuffling once at ingest;
  * it's the batch analog of the reference's clustered
  * (record_id, timestamp) index.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
