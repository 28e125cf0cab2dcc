package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** The distributed rank suite (ts23's production path) must equal the
  * exact-window twin BIT-FOR-BIT — rank/dense_rank/percent_rank/
  * cume_dist/row_number/ntile — on corpora engineered to stress the
  * cutoff machinery: heavy ties (a single value carried by 30% of
  * rows, guaranteed to straddle naive cutoffs), skewed value mass,
  * tiny corpora (N < tiles, N = 1), and an all-equal corpus (one tie
  * class spanning every range bucket candidate). The window twin is
  * the DuckDB-oracle shape, so equality here is the cross-derivation
  * proof that the distributed path stays oracle-green. */
class RankSuiteSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.expressions.Window

  /** The single-window twin — the ORACLE shape (DuckDB computes these
    * columns as plain exact window functions). Lives in the test tree
    * on purpose: its unpartitioned windows are a single-task sort at
    * scale, and src/main stays grep-clean of `Window.orderBy` without
    * a partition key (except ts6's and the anchor pick's
    * limit-bounded inputs). */
  private def rankSuiteWindow(totals: DataFrame, user: String,
                              value: String, bucket: String,
                              tiles: Int): DataFrame = {
    val wTie = Window.orderBy(col(bucket).desc)
    val wUnique = Window.orderBy(col(value).desc, col(user).asc)
    totals.select(col(user), col(value), col(bucket),
        rank().over(wTie).as("rnk"),
        dense_rank().over(wTie).as("drnk"),
        round(percent_rank().over(wTie), 6).as("pct"),
        round(cume_dist().over(wTie), 6).as("cd"),
        row_number().over(wUnique).as("rn"),
        ntile(tiles).over(wUnique).as("quartile"))
      .orderBy(user)
  }

  private def compare(rows: Seq[(String, Double)], tiles: Int = 4,
                      parts: Int = 32): Unit = {
    val totals = rows.toDF("user_id", "total_value")
      .withColumn("bucket", floor(col("total_value") / 50))
      .repartition(5)
      .localCheckpoint()
    val prod = TimeSeries.rankSuite(totals, "user_id", "total_value",
        "bucket", tiles, parts)
    val win = rankSuiteWindow(totals, "user_id", "total_value",
        "bucket", tiles)
    assert(prod.columns.toSeq == win.columns.toSeq)
    assert(prod.collect().map(_.toSeq).toSeq == win.collect().map(_.toSeq).toSeq)
  }

  test("skewed corpus with a dominant tie class: distributed == window") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      val v =
        if (i % 10 < 3) 250.0                      // 30% share one value
        else if (i % 10 < 5) (i % 7) * 50.0        // bucket-boundary values
        else math.floor(math.pow(rnd.nextDouble(), 3) * 10000) / 10.0
      (f"u$i%05d", v)
    }
    compare(rows)
  }

  test("all-equal corpus: one tie class, every rank 1, rn still unique") {
    compare((0 until 200).map(i => (f"u$i%03d", 99.0)))
  }

  test("tiny corpora: N < tiles, N = 1, N = 0") {
    compare(Seq(("a", 3.0), ("b", 1.0), ("c", 2.0))) // N=3 < 4 tiles
    compare(Seq(("solo", 7.0)))                      // percent_rank 0 at N=1
    compare(Nil)
  }

  test("exact tile boundaries: N % tiles == 0 and == tiles-1") {
    compare((0 until 80).map(i => (f"u$i%02d", i * 1.0)))   // 80 % 4 == 0
    compare((0 until 79).map(i => (f"u$i%02d", i * 1.0)))   // 79 % 4 == 3
  }

  test("few range parts force multi-bucket paths; parts > N degenerates safely") {
    val rows = (0 until 300).map(i => (f"u$i%03d", (i % 13) * 17.0))
    compare(rows, parts = 2)
    compare(rows, parts = 512)
  }
}
