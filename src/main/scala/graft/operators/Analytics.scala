package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational analytics headliners (TPC-H flavor) used as benchmark
  * queries. These exercise the plan shapes that dominate at 100 TB:
  * scan-heavy filter+aggregate (q1/q6: one shuffle, partial aggs,
  * filters and column pruning pushed to parquet) and star joins
  * (q3: dimension side broadcast, single fact-fact shuffle on the
  * shared key, AQE handles skew).
  *
  * Money sums go through DECIMAL so results are order-independent
  * (SURVEY §5); per-row arithmetic stays in double (deterministic IEEE,
  * identical in the DuckDB oracle).
  */
object Analytics {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def dec6(c: Column): Column = c.cast("decimal(18,6)")

  /** TPC-H Q1 flavor: pricing summary on lineitem at a ship-date cutoff. */
  def q1PricingSummary(spark: SparkSession, sfDir: String, cutoff: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 6))
      .withColumn("avg_price", round(col("sum_base_price") / col("count_order"), 6))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3 flavor: unshipped-order revenue for one market segment.
    * customer is small → broadcast into orders; orders⋈lineitem is the
    * one real shuffle (both sides hash on the order key). */
  def q3ShippingPriority(spark: SparkSession, sfDir: String,
                         segment: String, date: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === segment).select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit(date).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit(date).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5 flavor: local-supplier revenue per nation in one region.
    * Star-join shape: nation/region/supplier broadcast; the two fact
    * shuffles (orders⋈customer on custkey, lineitem⋈orders on orderkey)
    * are the only exchanges — customer is NOT broadcast because at
    * 100 TB it's a fact-sized table. */
  def q5LocalSupplier(spark: SparkSession, sfDir: String,
                      region: String, year: Int): DataFrame = {
    val r = Tables.region(spark, sfDir).filter(col("r_name") === region)
    val n = Tables.nation(spark, sfDir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val cu = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H Q18 flavor: large-volume orders. The HAVING side is computed
    * first (partial-agg on the fact, one shuffle on orderkey) and the
    * survivors — a tiny set — drive the joins. */
  def q18LargeOrders(spark: SparkSession, sfDir: String, minQty: Double): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    val o = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cu = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q7 flavor: shipping volume between two nations by year.
    * nation/supplier/customer-side dims broadcast; the fact shuffles
    * once per join key. */
  def q7VolumeShipping(spark: SparkSession, sfDir: String,
                       nationA: String, nationB: String): DataFrame = {
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cu = Tables.customer(spark, sfDir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .filter(
        (col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("double").as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q14 flavor: promo revenue share for one month — broadcast
    * part into the date-pruned lineitem scan, two conditional decimal
    * sums, ratio in double. */
  def q14PromoRevenue(spark: SparkSession, sfDir: String, month: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_type")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(s"$month-01").cast("timestamp") &&
        col("l_shipdate") < add_months(lit(s"$month-01").cast("timestamp"), 1))
      .select("l_partkey", "l_extendedprice", "l_discount")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .otherwise(lit(0).cast("decimal(18,6)"))).cast("double").as("promo"),
        sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("total"))
      .select(round(lit(100.0) * col("promo") / col("total"), 6).as("promo_revenue"))
  }

  /** TPC-H Q10 flavor: revenue lost to returned items per customer in
    * a quarter — fact-fact shuffle on the order key, customer/nation
    * joined after aggregation cuts the row count. */
  def q10ReturnedItems(spark: SparkSession, sfDir: String, quarterStart: String): DataFrame = {
    val start = lit(quarterStart).cast("timestamp")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= start &&
        col("o_orderdate") < add_months(start, 3))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val cu = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("double").as("revenue"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q6 flavor: forecast revenue change — pure scan+filter+agg;
    * every predicate reaches the parquet reader. */
  def q6RevenueDelta(spark: SparkSession, sfDir: String, year: Int): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(
        col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(dec6(col("l_extendedprice") * col("l_discount")))
        .cast("double").as("revenue"))
  }
}
