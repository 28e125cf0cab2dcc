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

  test("md5_prefix60 works from SQL and matches the composed form") {
    val got = spark.sql(
      """SELECT md5_prefix60('hello') AS native,
        |  CAST(conv(substring(md5('hello'), 1, 15), 16, 10) AS BIGINT) AS composed"""
        .stripMargin).as[(Long, Long)].head()
    assert(got._1 == got._2)
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
