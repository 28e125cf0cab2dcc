package graft.tmp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object HotProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Long): Double = { val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9 }
    def med3(f: => Long): Double = Seq(time(f), time(f), time(f)).sorted.apply(1)
    // string ids: the realistic doc-id shape (URLs/uuids)
    def hotDocs(n: Long) = spark.range(n)
      .select(concat(lit("doc::"), lpad(col("id").cast("string"), 12, "0")).as("doc_id"),
        lit("same boilerplate").as("text"))
    def exactUnbounded(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
        .groupBy("content_hash")
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"),
          concat_ws(",",
            slice(sort_array(collect_list(col("doc_id"))), 1, 100)).as("doc_ids"))
    val h1 = hotDocs(1000000L).localCheckpoint()
    val h8 = hotDocs(8000000L).localCheckpoint()
    graft.dedup.Dedup.exact(h1, "doc_id", "text").count()
    graft.dedup.Dedup.exact(h8, "doc_id", "text").count()
    exactUnbounded(h1).count(); exactUnbounded(h8).count()
    val de1 = med3(graft.dedup.Dedup.exact(h1, "doc_id", "text").count())
    val de8 = med3(graft.dedup.Dedup.exact(h8, "doc_id", "text").count())
    val du1 = med3(exactUnbounded(h1).count())
    val du8 = med3(exactUnbounded(h8).count())
    println(f"bounded   1M=$de1%.2f 8M=$de8%.2f ratio=${de8/de1}%.1f")
    println(f"unbounded 1M=$du1%.2f 8M=$du8%.2f ratio=${du8/du1}%.1f")
    spark.stop()
  }
}
