package org.apache.spark.graftbridge

import com.codahale.metrics.MetricRegistry
import org.apache.spark.SparkEnv
import org.apache.spark.metrics.source.Source

/** Bridge into Spark's `private[spark]` metrics system: registers a
  * named Source with the driver MetricsSystem and hands back its
  * MetricRegistry for the caller to populate. Whatever sink the
  * deployment configures (metrics.properties: Prometheus servlet,
  * JMX, Graphite, ...) then exports every gauge registered there —
  * the Spark-native equivalent of the reference mounting its
  * `/metrics` ASGI app (reference app/main.py:57). No Spark internals
  * are modified.
  */
object MetricsBridge {
  def registerSource(name: String): MetricRegistry = {
    val registry = new MetricRegistry
    val source = new Source {
      override val sourceName: String = name
      override val metricRegistry: MetricRegistry = registry
    }
    SparkEnv.get.metricsSystem.registerSource(source)
    registry
  }
}
