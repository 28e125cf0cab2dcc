package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** The ONLY place src/main builds single-partition windows (r18,
  * closing the r17 verdict's "unguarded global window" item): a
  * global window moves its whole input to one task, which is safe
  * exactly when the input is a bounded aggregate (one row per state /
  * source / stratum×bucket / histogram bucket), never raw data.
  *
  * Every call site must name its cardinality bound — the string is
  * carried into the require so a thoughtless `globalAgg("")` fails
  * fast, and a grep for `Window.partitionBy()` outside this file is
  * the round-gate check that no unguarded site crept back in. A
  * caller whose group column is NOT bounded by construction must use
  * a distributed construction (TimeSeries.rankSuite's approx-cutoff
  * shape) instead of reaching for this helper.
  */
object BoundedWindows {

  /** A global window over a BOUNDED aggregate (the scalar-anchor
    * shape: grand totals, corpus totals, max anchors attached to a
    * report-sized table). `bound` documents why the input is small,
    * e.g. "<= one row per state". */
  def globalAgg(bound: String): WindowSpec = {
    require(bound != null && bound.trim.nonEmpty,
      "globalAgg: name the input's cardinality bound")
    Window.partitionBy()
  }

  /** A globally-ORDERED window over a BOUNDED aggregate (the
    * cumulative-histogram shape). Same contract as [[globalAgg]]. */
  def globalOrdered(bound: String, order: Column*): WindowSpec = {
    require(bound != null && bound.trim.nonEmpty,
      "globalOrdered: name the input's cardinality bound")
    Window.orderBy(order: _*)
  }
}
