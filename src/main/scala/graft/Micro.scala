package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text

/** Ad-hoc stage micro-profiler (not part of the driver contract). */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    time("scan")(docs.count())
    time("scan (warm)")(docs.count())
    time("repartition")(docs.repartition(col("doc_id")).count())
    val sh = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(Text.shingles(col("text"), 3)).as("shingle"))
    time("shingle explode")(sh.count())
    time("shingle explode (2nd)")(sh.count())
    val hashed = sh.select(col("doc_id"),
      conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("b"))
    time("+md5+conv")(hashed.count())
    time("+groupBy 16 mins")(
      hashed.groupBy(col("doc_id"))
        .agg(min(col("b")).as("m0"),
          (1 until 16).map(p => min(col("b").bitwiseXOR(lit(p * 1000L))).as(s"m$p")): _*)
        .count())
    val e = sh
    val a = e.select(col("doc_id").as("id_a"), col("shingle"))
    val b = e.select(col("doc_id").as("id_b"), col("shingle"))
    time("self-join on shingle")(
      a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b")).count())
    spark.stop()
  }
}
