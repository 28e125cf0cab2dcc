package graft

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join produces exactly the rows of the plain equi-join") {
    // one hot key (90% of rows) + long tail
    val left = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong + 1, i.toLong + 1000)))
      .toDF("k", "tie")
    val right = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "name")

    val plain = left.join(right, Seq("k")).select("k", "tie", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", "tie", 8)
      .select("k", "tie", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }
}
