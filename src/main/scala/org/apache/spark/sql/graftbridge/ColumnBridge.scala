package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 made the conversion
  * `private[sql]` (connect-compatible Column wraps a ColumnNode, not an
  * Expression); this package-nested object re-exports it for graft's
  * native expressions. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the listener bus (QueryExecutionListener callbacks are
    * asynchronous); private[spark], re-exported for graft.Metrics. */
  def flushListeners(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Wrap an already-resolved LogicalPlan as a DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Release the storage blocks behind a `localCheckpoint()`ed
    * DataFrame (its plan is a LogicalRDD over the checkpointed RDD —
    * `Dataset.unpersist` does not reach those blocks). Iterative
    * algorithms that checkpoint per round MUST free superseded rounds,
    * or the blocks accumulate in the block manager for the life of the
    * session and degrade everything running after them. No-op for
    * non-checkpoint plans. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
