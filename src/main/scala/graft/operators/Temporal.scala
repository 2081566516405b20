package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Tables.t

/** Temporal modeling operators over the event stream: ordered-funnel
  * conversion and SCD2 (slowly-changing-dimension type 2) interval
  * construction — the two standard product-analytics/warehouse shapes
  * not yet on the board.
  *
  * Time is integer epoch-microseconds end to end (`ts div 1000` of the
  * parquet nanos), so every boundary compare is bit-identical in the
  * DuckDB oracle.
  */
object Temporal {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("tus"))

  /** Ordered funnel view → click → purchase: per user, the FIRST view,
    * the first click strictly after it within the 1-day conversion
    * window, the first purchase strictly after that within another
    * day; reported as per-stage user counts and conversion shares.
    *
    * Scale shape: three grouped min-aggs, each an equi-join on user_id
    * against the previous stage's (tiny) per-user frame — every
    * shuffle is on the same key so the exchange layout is reused; no
    * window over the full event set, no self-join of events to
    * events at row level. The per-stage frames only shrink. */
  private val dayUs = 86400L * 1000000L

  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tus").as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("tus") > col("t1") && col("tus") <= col("t1") + dayUs)
      .groupBy("user_id").agg(min("tus").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("tus") > col("t2") && col("tus") <= col("t2") + dayUs)
      .groupBy("user_id").agg(min("tus").as("t3"))
    val counts = s1.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_view"))
      .unionByName(s2.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_click")))
      .unionByName(s3.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase")))
    val first = s1.agg(count(lit(1)).as("n0"))
    counts.crossJoin(broadcast(first))
      .select(col("stage"), col("n").as("n_users"),
        (col("n").cast("double") / col("n0").cast("double")).as("share_of_entry"))
      .orderBy("stage")
  }

  val funnelConversionSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
      |), s1 AS (
      |  SELECT user_id, min(tus) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, min(tus) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE event_type = 'click' AND tus > t1 AND tus <= t1 + 86400000000 GROUP BY 1
      |), s3 AS (
      |  SELECT e.user_id, min(tus) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE event_type = 'purchase' AND tus > t2 AND tus <= t2 + 86400000000 GROUP BY 1
      |), counts AS (
      |  SELECT '1_view' AS stage, count(*) AS n_users FROM s1
      |  UNION ALL SELECT '2_click', count(*) FROM s2
      |  UNION ALL SELECT '3_purchase', count(*) FROM s3
      |)
      |SELECT stage, n_users,
      |       CAST(n_users AS DOUBLE) / CAST((SELECT count(*) FROM s1) AS DOUBLE) AS share_of_entry
      |FROM counts ORDER BY stage""".stripMargin

  /** SCD2 interval construction: each user's event_type stream becomes
    * versioned validity intervals — a new version ONLY when the type
    * changes (consecutive duplicates collapse), valid_to = next
    * version's valid_from (exclusive), NULL while current. The
    * change-data-capture → dimension-table build every warehouse runs.
    *
    * Scale shape: both windows (change detection, next-change lookup)
    * partition by user_id with the same ordering — one shuffle, one
    * sort, two window passes; nothing global. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val changes = ev(spark, dir)
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val wc = Window.partitionBy("user_id").orderBy("tus", "event_id")
    changes
      .select(col("user_id"), col("event_type").as("state"),
        col("tus").as("valid_from_us"),
        lead("tus", 1).over(wc).as("valid_to_us"),
        row_number().over(wc).cast("long").as("version"))
      .orderBy("user_id", "version")
  }

  val scd2IntervalsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
      |), changes AS (
      |  SELECT user_id, event_type, tus, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev_type
      |  FROM e
      |)
      |SELECT user_id, event_type AS state,
      |       tus AS valid_from_us,
      |       lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS valid_to_us,
      |       row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS version
      |FROM changes
      |WHERE prev_type IS NULL OR prev_type <> event_type
      |ORDER BY user_id, version""".stripMargin

  /** SCD2 temporal lookup: resolve every event against the dimension
    * version valid at its timestamp — the fact-to-SCD2 join every
    * warehouse runs, expressed through the NATIVE as-of join (its
    * second production use on the board). Because the intervals tile
    * each user's timeline (valid_to = next valid_from), "latest
    * valid_from ≤ ts" IS interval containment — the O(n·m) theta join
    * the oracle runs never exists in the engine plan, only a
    * co-partitioned single-pass merge. The dimension side is
    * aggregated to one row per (user, valid_from) — max version wins,
    * matching the half-open-interval rule at change-point ts
    * collisions — per the as-of tie contract. */
  def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val facts = ev(spark, dir).select(col("user_id"), col("event_id"), col("tus"))
    val dim = scd2Intervals(spark, dir)
      .groupBy(col("user_id"), col("valid_from_us").as("tus"))
      .agg(max("version").as("version"))
    graft.plans.AsOfJoin
      .asof(facts, dim, key = "user_id", ts = "tus",
        payload = "version", outName = "version")
      .orderBy("user_id", "event_id")
  }

  val scd2LookupSql: String =
    s"""WITH iv AS (${scd2IntervalsSql.replace("ORDER BY user_id, version", "")}),
       |dim AS (
       |  SELECT user_id, valid_from_us, max(version) AS version
       |  FROM iv GROUP BY user_id, valid_from_us
       |), dim2 AS (
       |  SELECT user_id, valid_from_us, version,
       |         lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us
       |  FROM dim
       |), e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
       |)
       |SELECT e.user_id, e.event_id, e.tus, d.version
       |FROM e JOIN dim2 d
       |  ON e.user_id = d.user_id
       | AND d.valid_from_us <= e.tus
       | AND (d.valid_to_us IS NULL OR e.tus < d.valid_to_us)
       |ORDER BY e.user_id, e.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_funnel_conversion" -> funnelConversion,
    "ts_scd2_intervals" -> scd2Intervals,
    "ts_scd2_lookup" -> scd2Lookup)

  val oracles: Map[String, String] = Map(
    "ts_funnel_conversion" -> funnelConversionSql,
    "ts_scd2_intervals" -> scd2IntervalsSql,
    "ts_scd2_lookup" -> scd2LookupSql)
}
