package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicReference, LongAdder}
import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

/** Lightweight operation metrics — the Spark-side analog of the
  * reference's Prometheus surface (reference app/main.py:34-57:
  * per-operation `Counter`s, a per-endpoint latency `Histogram` with
  * the default prometheus buckets, mounted at `/metrics`).
  *
  * Labels ride on Spark JOB TAGS, not shared mutable state: `timed`
  * tags the calling thread, the tag is captured into each SQL
  * execution it launches (`SparkListenerSQLExecutionStart.jobTags`),
  * and the listener resolves the label from the completed execution
  * itself — so concurrent `timed` operations on one driver each count
  * their own queries. Counters, cumulative latency, and a bucketed
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

  private val TagPrefix = "graft-op:"

  private val counts = new ConcurrentHashMap[String, LongAdder]()
  private val nanos = new ConcurrentHashMap[String, LongAdder]()
  // one LongAdder per bucket (BucketBounds + the +Inf overflow slot)
  private val hist = new ConcurrentHashMap[String, Array[LongAdder]]()
  // root execution id -> (operation, start ms); removed when the
  // execution ends, so the map holds only in-flight executions
  private val inFlight = new ConcurrentHashMap[java.lang.Long, (String, Long)]()
  private val installed = new AtomicLong(0)
  private val registry =
    new AtomicReference[com.codahale.metrics.MetricRegistry](null)
  // ops whose gauges are already registered: skips the registry
  // snapshot probe (getGauges builds a fresh sorted map) per event
  private val exported = ConcurrentHashMap.newKeySet[String]()

  private object Listener extends SparkListener {
    override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
      case s: SparkListenerSQLExecutionStart
          // count root executions only — nested/sub-executions would
          // double-count one logical operation
          if s.rootExecutionId.forall(_ == s.executionId) =>
        val op = s.jobTags.filter(_.startsWith(TagPrefix)) match {
          case ts if ts.isEmpty => "other"
          case ts => ts.min.stripPrefix(TagPrefix) // deterministic if nested
        }
        inFlight.put(s.executionId, (op, s.time))
      case e: SparkListenerSQLExecutionEnd =>
        Option(inFlight.remove(e.executionId)).foreach { case (op, startMs) =>
          record(op, (e.time - startMs) * 1000000L)
        }
      case _ => ()
    }
  }

  private def record(op: String, d: Long): Unit = {
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

  /** Install the listener once per JVM (shared listener bus). */
  def install(spark: SparkSession): Unit =
    if (installed.compareAndSet(0, 1))
      spark.sparkContext.addSparkListener(Listener)

  /** Register a `graft` Source with the Spark metrics system; every
    * per-operation counter / latency / histogram bucket surfaces as a
    * gauge that the deployment's configured sink exports — the analog
    * of the reference's mounted `/metrics` endpoint (app/main.py:57).
    * Idempotent — repeated calls neither re-register the Source nor
    * orphan a registry. Also installs the listener. */
  def registerSource(spark: SparkSession): Unit = {
    install(spark)
    if (registry.get() == null) this.synchronized {
      if (registry.get() == null) {
        registry.set(
          org.apache.spark.graftbridge.MetricsBridge.registerSource("graft"))
        // surface anything recorded before registration
        import scala.jdk.CollectionConverters._
        counts.keySet().asScala.foreach(exportGauges)
      }
    }
  }

  /** Lazily add the op's gauges to the registered source (new ops can
    * appear at any time; sinks poll the registry, so late gauges are
    * picked up on the next report). */
  private def exportGauges(op: String): Unit = {
    val reg = registry.get()
    if (reg != null && exported.add(op)) {
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

  /** Run `body` with the Spark queries it launches counted under
    * `operation` — like the reference's
    * `record_operations.labels(op).inc()` + latency histogram. The
    * label is a job tag on the calling thread, captured into each SQL
    * execution `body` starts; concurrent `timed` calls on other
    * threads are unaffected. Drains the (async) listener bus on exit
    * so the counters are read-your-writes. */
  def timed[T](spark: SparkSession, operation: String)(body: => T): T = {
    install(spark)
    val tag = TagPrefix + operation.replace(",", "_")
    spark.sparkContext.addJobTag(tag)
    try body finally {
      spark.sparkContext.removeJobTag(tag)
      org.apache.spark.sql.graftbridge.ColumnBridge.flushListeners(spark)
    }
  }

  /** Count + time one driver-side operation CALL — the reference's
    * per-endpoint Counter + latency Histogram shape (app/main.py:35-47
    * wraps each endpoint handler): the call is recorded once with its
    * wall time under `operation`, and any Spark SQL executions the
    * body launches are attributed to `operation`.sql via [[timed]]'s
    * job tag — two label spaces, so a lazy read (count 1, few ms) and
    * its later actions never double-count each other. */
  def timedCall[T](spark: SparkSession, operation: String)(body: => T): T = {
    install(spark)
    val t0 = System.nanoTime()
    val r = timed(spark, operation + ".sql")(body)
    record(operation, System.nanoTime() - t0)
    r
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
