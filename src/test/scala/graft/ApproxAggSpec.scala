package graft

import org.apache.spark.sql.functions._
import graft.operators.Tables

/** Approximate aggregates (HLL count-distinct, quantile sketches):
  * sketches are engine-specific so they get accuracy-bound specs, not
  * DuckDB oracles. */
class ApproxAggSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.t(spark, sf("sf0.01"), "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact percentile") {
    val li = Tables.t(spark, sf("sf0.01"), "lineitem")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_p50")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"exact=$exact approx=$approx")
  }
}
