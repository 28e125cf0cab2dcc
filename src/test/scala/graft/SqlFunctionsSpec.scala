package graft

/** The native expressions must be reachable from plain SQL via the
  * session extensions (word_shingles, cosine_sim). */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("word_shingles works from SQL") {
    val got = spark.sql("SELECT word_shingles('a b c d', 3) AS s")
      .as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
  }

  test("cosine_sim works from SQL") {
    val one = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .as[Double].head()
    assert(one == 1.0)
    val orth = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c")
      .as[Double].head()
    assert(orth == 0.0)
  }
}
