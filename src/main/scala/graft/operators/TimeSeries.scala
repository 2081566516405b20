package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series operators over the events stream table: as-of join and
  * explicit GROUPING SETS.
  *
  * The as-of join ("for each row, the latest matching row at or before
  * its timestamp") is expressed as a single partitioned ordered window
  * with an ignore-nulls running last — one shuffle on the entity key,
  * no range cross-join, which is exactly how it scales: the union of
  * both streams sorts once per key. (The alternative inequality join is
  * O(n·m) per key and never needed.)
  */
object TimeSeries {
  import Tables.t

  /** For each 'click' event: the most recent 'error' event of the same
    * user at or before it (NULL if none yet). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // timestamps are emitted at µs granularity: DuckDB reads ns-parquet
    // timestamps truncated to µs, so raw ns values can never oracle-match
    t(spark, dir, "events")
      .withColumn("asof_error_us",
        last(when(col("event_type") === "error", expr("ts div 1000")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("click_us"), col("asof_error_us"))
      .orderBy("user_id", "event_id")
  }

  val asofJoinSql: String =
    """SELECT user_id, event_id, epoch_us(ts) AS click_us, asof_error_us
      |FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |         last_value(CASE WHEN event_type = 'error' THEN epoch_us(ts) END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_error_us
      |  FROM events
      |)
      |WHERE event_type = 'click'
      |ORDER BY user_id, event_id""".stripMargin

  /** Explicit GROUPING SETS: (type), (hour), and grand total in one
    * pass — the general form behind rollup/cube. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("v_events_gs")
    spark.sql(
      """SELECT event_type, (ts div 3600000000000) * 3600 AS hour_start,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM v_events_gs
        |GROUP BY GROUPING SETS ((event_type), ((ts div 3600000000000) * 3600), ())
        |ORDER BY event_type ASC NULLS FIRST, hour_start ASC NULLS FIRST""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT event_type, (epoch_ns(ts) // 3600000000000) * 3600 AS hour_start,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), ((epoch_ns(ts) // 3600000000000) * 3600), ())
      |ORDER BY event_type ASC NULLS FIRST, hour_start ASC NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_asof_join" -> asofJoin,
    "agg_grouping_sets" -> groupingSets)

  val oracles: Map[String, String] = Map(
    "ts_asof_join" -> asofJoinSql,
    "agg_grouping_sets" -> groupingSetsSql)
}
