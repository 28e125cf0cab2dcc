package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, LongAdder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Lightweight operation metrics — the Spark-side analog of the
  * reference's Prometheus counters/histograms
  * (reference app/main.py:34-52: per-operation counts, query latency).
  * A QueryExecutionListener tags completed actions with the running
  * operation label; counters and cumulative latency are queryable
  * in-process (and would be wired to the Spark metrics sink / a
  * Prometheus servlet in a deployment).
  */
object Metrics {

  private val counts = new ConcurrentHashMap[String, LongAdder]()
  private val nanos = new ConcurrentHashMap[String, LongAdder]()
  // volatile, not thread-local: listener callbacks arrive on the bus
  // thread, not the calling thread
  @volatile private var current: String = "other"
  private val installed = new AtomicLong(0)

  private object Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = record(durationNs)
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = record(0L)
    private def record(d: Long): Unit = {
      val op = current
      counts.computeIfAbsent(op, _ => new LongAdder).increment()
      nanos.computeIfAbsent(op, _ => new LongAdder).add(d)
    }
  }

  /** Install the listener once per session. */
  def install(spark: SparkSession): Unit =
    if (installed.compareAndSet(0, 1)) spark.listenerManager.register(Listener)

  /** Run `body` with its Spark actions counted under `operation` —
    * like the reference's `record_operations.labels(op).inc()` +
    * latency histogram. Drains the (async) listener bus before
    * restoring the label so the callbacks land on this operation. */
  def timed[T](spark: SparkSession, operation: String)(body: => T): T = {
    val prev = current
    current = operation
    try body finally {
      org.apache.spark.sql.graftbridge.ColumnBridge.flushListeners(spark)
      current = prev
    }
  }

  def count(operation: String): Long =
    Option(counts.get(operation)).map(_.sum()).getOrElse(0L)

  def totalSeconds(operation: String): Double =
    Option(nanos.get(operation)).map(_.sum() / 1e9).getOrElse(0.0)

  def snapshot: Map[String, (Long, Double)] = {
    import scala.jdk.CollectionConverters._
    counts.keySet().asScala.map(k => k -> (count(k), totalSeconds(k))).toMap
  }
}
