package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicReference, LongAdder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Lightweight operation metrics — the Spark-side analog of the
  * reference's Prometheus surface (reference app/main.py:34-57:
  * per-operation `Counter`s, a per-endpoint latency `Histogram` with
  * the default prometheus buckets, mounted at `/metrics`).
  * A QueryExecutionListener tags completed actions with the running
  * operation label; counters, cumulative latency, and a bucketed
  * latency histogram are queryable in-process, and `registerSource`
  * wires them into the Spark metrics system so any configured sink
  * (Prometheus servlet, JMX, ...) exports them in a deployment.
  */
object Metrics {

  /** Histogram bucket upper bounds in seconds — prometheus
    * client_library defaults, i.e. what the reference's
    * `Histogram('temporal_vault_query_latency_seconds', ...)` uses
    * (app/main.py:42-47). A final +Inf bucket is implicit. */
  val BucketBounds: IndexedSeq[Double] = IndexedSeq(
    0.005, 0.01, 0.025, 0.05, 0.075, 0.1, 0.25, 0.5, 0.75, 1.0,
    2.5, 5.0, 7.5, 10.0)

  private val counts = new ConcurrentHashMap[String, LongAdder]()
  private val nanos = new ConcurrentHashMap[String, LongAdder]()
  // one LongAdder per bucket (BucketBounds + the +Inf overflow slot)
  private val hist = new ConcurrentHashMap[String, Array[LongAdder]]()
  // volatile, not thread-local: listener callbacks arrive on the bus
  // thread, not the calling thread
  @volatile private var current: String = "other"
  private val installed = new AtomicLong(0)
  private val registry =
    new AtomicReference[com.codahale.metrics.MetricRegistry](null)

  private object Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = record(durationNs)
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = record(0L)
    private def record(d: Long): Unit = {
      val op = current
      counts.computeIfAbsent(op, _ => new LongAdder).increment()
      nanos.computeIfAbsent(op, _ => new LongAdder).add(d)
      val buckets = hist.computeIfAbsent(op, _ =>
        Array.fill(BucketBounds.length + 1)(new LongAdder))
      val secs = d / 1e9
      val idx = BucketBounds.indexWhere(secs <= _) match {
        case -1 => BucketBounds.length // +Inf slot
        case i => i
      }
      buckets(idx).increment()
      exportGauges(op)
    }
  }

  /** Install the listener once per session. */
  def install(spark: SparkSession): Unit =
    if (installed.compareAndSet(0, 1)) spark.listenerManager.register(Listener)

  /** Register a `graft` Source with the Spark metrics system; every
    * per-operation counter / latency / histogram bucket surfaces as a
    * gauge that the deployment's configured sink exports — the analog
    * of the reference's mounted `/metrics` endpoint (app/main.py:57).
    * Idempotent; also installs the listener. */
  def registerSource(spark: SparkSession): Unit = {
    install(spark)
    if (registry.compareAndSet(null,
        org.apache.spark.graftbridge.MetricsBridge.registerSource("graft"))) {
      // surface anything recorded before registration
      import scala.jdk.CollectionConverters._
      counts.keySet().asScala.foreach(exportGauges)
    }
  }

  /** Lazily add the op's gauges to the registered source (new ops can
    * appear at any time; sinks poll the registry, so late gauges are
    * picked up on the next report). */
  private def exportGauges(op: String): Unit = {
    val reg = registry.get()
    if (reg != null && !reg.getGauges.containsKey(s"$op.count")) {
      try {
        reg.register(s"$op.count",
          new com.codahale.metrics.Gauge[Long] { def getValue: Long = count(op) })
        reg.register(s"$op.latency_total_seconds",
          new com.codahale.metrics.Gauge[Double] {
            def getValue: Double = totalSeconds(op) })
        BucketBounds.indices.foreach { i =>
          reg.register(s"$op.latency_le_${BucketBounds(i)}",
            new com.codahale.metrics.Gauge[Long] {
              def getValue: Long = histogram(op)(i)._2 })
        }
        reg.register(s"$op.latency_le_inf",
          new com.codahale.metrics.Gauge[Long] {
            def getValue: Long = histogram(op).last._2 })
      } catch { case _: IllegalArgumentException => () } // raced: present
    }
  }

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

  /** Cumulative latency histogram, prometheus-style: (le_seconds, n)
    * pairs, monotone non-decreasing, last bound +Inf with n = count. */
  def histogram(operation: String): IndexedSeq[(Double, Long)] = {
    val raw = Option(hist.get(operation))
      .map(_.map(_.sum()))
      .getOrElse(Array.fill(BucketBounds.length + 1)(0L))
    val bounds = BucketBounds :+ Double.PositiveInfinity
    val cum = raw.scanLeft(0L)(_ + _).drop(1)
    bounds.zip(cum)
  }

  def snapshot: Map[String, (Long, Double)] = {
    import scala.jdk.CollectionConverters._
    counts.keySet().asScala.map(k => k -> (count(k), totalSeconds(k))).toMap
  }
}
