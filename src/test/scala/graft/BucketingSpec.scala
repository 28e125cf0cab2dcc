package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

/** Bucketed co-location must eliminate the shuffle: a groupBy on the
  * bucket key over the bucketed table plans without an Exchange, and a
  * self-join on the key plans without any Exchange either. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("groupBy and join on the bucket key plan without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS events_bucketed")
    val warehouse = new java.io.File("spark-warehouse/events_bucketed")
    if (warehouse.exists())
      scala.reflect.io.Directory(warehouse).deleteRecursively()
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "value")
    Bucketing.writeBucketed(ev, "events_bucketed", "user_id", 8)
    val t = Bucketing.read(spark, "events_bucketed")

    val aggPlan = t.groupBy($"user_id").agg(sum($"value"))
      .queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"agg still shuffles:\n$aggPlan")

    // force a non-broadcast join so co-location is what's being tested
    val joinPlan = t.as("a").hint("merge").join(t.as("b"), "user_id")
      .queryExecution.executedPlan.toString
    assert(!joinPlan.contains("Exchange hashpartitioning"),
      s"join still shuffles:\n$joinPlan")

    // and the result is still right
    val viaBucket = t.groupBy($"user_id").count().count()
    val direct = ev.select($"user_id").distinct().count()
    assert(viaBucket == direct)
  }
}
