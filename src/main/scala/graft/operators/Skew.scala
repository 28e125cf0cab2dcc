package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the joins AQE can't fix on its own
  * (e.g. when the skewed side feeds a window, or the planner's skew
  * thresholds don't trigger).
  *
  * `saltedJoin` splits each hot left-side key across `salts` shuffle
  * partitions and replicates the (smaller, but not broadcastable)
  * right side once per salt: left rows get a random-but-deterministic
  * salt from a stable hash of their tie-break column, right rows are
  * exploded over all salts. Join key becomes (key, salt) — hot keys
  * fan out over `salts` reducers instead of one straggler.
  *
  * Equivalent rows to a plain inner equi-join (spec-checked); use when
  * a key's row count is orders of magnitude above the median and the
  * right side is too big to broadcast but small enough to replicate
  * `salts` times.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftTie: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(leftTie)), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
