package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Tables.t

/** Additional TPC-H-shaped analytics (Q6/Q10/Q14/Q18 adapted to the
  * harness schema) — rounding out the classic decision-support surface
  * next to Q1/Q3/Q5/Q13/Q15 in Relational*.
  *
  * Same exactness rules as Relational: money math in DECIMAL end to
  * end (exact, order/partitioning-independent), DOUBLE only on the
  * final projection; every output totally ordered with unique
  * tie-break keys.
  */
object TpchMore {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private val one = lit(1).cast(DecimalType(18, 2))
  private val revenue = dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  /** Q6: forecasting revenue change — a pure scan-side filter + global
    * agg. The three predicates all push into the parquet scan; at scale
    * this is the cheapest possible shape (no shuffle beyond the final
    * 1-row combine). */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  val forecastRevenueSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05::DOUBLE AND 0.07::DOUBLE AND l_quantity < 24""".stripMargin

  /** Q10: returned-item reporting — customers ranked by revenue lost to
    * returns in a quarter. Order-date filter prunes the orders scan;
    * the nation dim broadcasts; top-20 is a TakeOrdered. */
  def returnedItems(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"))
      .join(t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(spark, dir, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  val returnedItemsSql: String =
    s"""SELECT c_custkey, c_name, n_name,
       |       CAST(sum($revenueSql) AS DOUBLE) AS revenue,
       |       count(*) AS n_items
       |FROM customer
       |  JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON o_orderkey = l_orderkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q14: promotion effect — conditional aggregation over a fact-dim
    * join. The part dim broadcasts; the promo share is a ratio of two
    * exact DECIMAL sums, divided once in doubles. */
  def promoEffect(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      // part scales with SF — no forced broadcast; the planner sizes the
      // join (auto-broadcast at harness scale, shuffled at 100 TB)
      .join(t(spark, dir, "part").select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0).cast(DecimalType(18, 2))))
          .cast("double").as("promo_revenue"),
        sum(revenue).cast("double").as("total_revenue"))
      .withColumn("promo_share",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))

  val promoEffectSql: String =
    s"""SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
       |       CAST(sum($revenueSql) AS DOUBLE) AS total_revenue,
       |       100.0::DOUBLE * CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       |         / CAST(sum($revenueSql) AS DOUBLE) AS promo_share
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  /** Q18: large-volume customers — a grouped HAVING over the fact table
    * feeding a semi-join back to orders/customers. The heavy groupBy
    * happens once on l_orderkey (map-side partials), and only the few
    * qualifying keys flow into the join. */
  def largeOrders(spark: SparkSession, dir: String, minQty: Int = 150): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(dec2(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > minQty)
    t(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(spark, dir, "customer").select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("total_qty").cast("double").as("total_qty"))
      .orderBy(desc("total_qty"), col("o_orderkey"))
  }

  def largeOrdersSql(minQty: Int = 150): String =
    s"""WITH big AS (
       |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > $minQty
       |)
       |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       |       CAST(total_qty AS DOUBLE) AS total_qty
       |FROM orders JOIN big ON o_orderkey = l_orderkey
       |            JOIN customer ON o_custkey = c_custkey
       |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6_forecast_revenue" -> forecastRevenue,
    "q10_returned_items" -> returnedItems,
    "q14_promo_effect" -> promoEffect,
    "q18_large_orders" -> ((s, d) => largeOrders(s, d)))

  val oracles: Map[String, String] = Map(
    "q6_forecast_revenue" -> forecastRevenueSql,
    "q10_returned_items" -> returnedItemsSql,
    "q14_promo_effect" -> promoEffectSql,
    "q18_large_orders" -> largeOrdersSql())
}
