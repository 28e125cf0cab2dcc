package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The NanoTsPushdown optimizer rule: time-travel predicates on the
  * nanos-long ts column must reach the parquet scan, and the rewrite
  * must be value-exact in both directions and at boundaries. */
class PushdownSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Tables.events(spark, sfDir)

  test("comparison is rewritten onto the raw column (pushed filter)") {
    val plan = ev.filter($"ts" <= lit("2024-01-20 00:00:00").cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), LessThanOrEqual(ts,"),
      s"no pushed range filter in:\n$plan")
  }

  test("rewritten predicates select exactly the same rows") {
    val t = "2024-01-15 11:22:33"
    // force the un-rewritten path by comparing via a non-matching shape
    val raw = ev.withColumn("us", unix_micros($"ts"))
    val cutUs = raw.select(unix_micros(lit(t).cast("timestamp"))).as[Long].head()
    for ((op, expected) <- Seq[(String, Long => Boolean)](
        ("<=", _ <= cutUs), ("<", _ < cutUs), (">=", _ >= cutUs), (">", _ > cutUs))) {
      val got = op match {
        case "<=" => ev.filter($"ts" <= lit(t).cast("timestamp"))
        case "<"  => ev.filter($"ts" < lit(t).cast("timestamp"))
        case ">=" => ev.filter($"ts" >= lit(t).cast("timestamp"))
        case ">"  => ev.filter($"ts" > lit(t).cast("timestamp"))
      }
      val want = raw.select("us").as[Long].collect().count(expected)
      assert(got.count() == want, s"op $op mismatch")
    }
  }
}
