package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Tables.t

/** Value-window functions and moment statistics.
  *
  * The moment statistics (mean/variance/correlation) are computed from
  * EXACT DECIMAL power sums (Σx, Σy, Σxy, Σx², Σy²) — commutative,
  * partitioning-independent — with the floating-point formula applied
  * once at the end to identical inputs, so the doubles are bit-identical
  * cross-engine. Spark's built-in corr()/stddev() stream doubles and are
  * summation-order-dependent — useless against a hash oracle and a
  * reproducibility hazard at 100 TB (same data, different partitioning,
  * different third decimal). This is the numerically-stable-by-exactness
  * alternative.
  */
object Analytics {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Value-window family over each user's event sequence: lag/lead,
    * first/last value over the running frame, and the 2nd event's type
    * via nth_value. Partitioned by user (scales); event-time order with
    * the event_id tie-break. */
  def valueWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .withColumn("first_type", first("event_type").over(wRun))
      .withColumn("second_type", nth_value(col("event_type"), 2).over(wRun))
      .withColumn("last_type_so_far", last("event_type").over(wRun))
      .select("user_id", "event_id", "ts_us", "event_type", "prev_type",
        "next_type", "first_type", "second_type", "last_type_so_far")
      .orderBy("user_id", "ts_us", "event_id")
  }

  // events.ts is read as epoch-nanos (Tables.t); DuckDB sees parquet ns
  // truncated to µs — integer µs is the portable meeting point.
  val valueWindowsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
      |)
      |SELECT user_id, event_id, ts_us, event_type,
      |       lag(event_type, 1) OVER w AS prev_type,
      |       lead(event_type, 1) OVER w AS next_type,
      |       first_value(event_type) OVER wrun AS first_type,
      |       nth_value(event_type, 2) OVER wrun AS second_type,
      |       last_value(event_type) OVER wrun AS last_type_so_far
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
      |       wrun AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** Median-absolute-deviation robust outliers per event_type — the
    * breakdown-point-0.5 estimator beside the winsorized (trim-based)
    * and z-score (moment-based) members of the robust-stats family. All
    * decision arithmetic is exact BIGINT: values quantize to 1e-4
    * fixed-point; the interpolated median is carried DOUBLED
    * (med2 = x_lo + x_hi over the two middle ranks, equal ranks when n
    * is odd), per-row deviations d = |2x − med2| = 2|x − med|, and the
    * MAD is carried ×4 (mad4 = d_lo + d_hi = 4·MAD) — so the outlier
    * predicate |x − med| > 3·MAD tests as 2·d > 3·mad4 with no float
    * compare anywhere. Two ranking passes (one per median), each ONE
    * shuffle on the group key with a within-group sort — the exact
    * two-pass selection shape; at 100 TB the quantile sketch is the
    * screening pass and this is its exact gate, the agg_quantile_sketch
    * posture. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val q = t(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        floor(col("value").cast("double") * 10000d + 0.5d).cast("long").as("x"))
    val nTab = q.groupBy("event_type").agg(count(lit(1)).as("n"))
    def doubledMedian(src: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy("event_type").orderBy(col(v), col("event_id"))
      src.withColumn("rn", row_number().over(w))
        .join(broadcast(nTab), "event_type")
        .groupBy("event_type")
        .agg((sum(when(col("rn") === expr("(n + 1) div 2"), col(v)).otherwise(0L)) +
          sum(when(col("rn") === expr("(n + 2) div 2"), col(v)).otherwise(0L))).as(out))
    }
    val med = doubledMedian(q, "x", "med2")
    val dev = q.join(broadcast(med), "event_type")
      .withColumn("d", abs(lit(2L) * col("x") - col("med2")))
    val mad = doubledMedian(dev.select(col("event_type"), col("event_id"), col("d")),
      "d", "mad4")
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("med2").as("med2"), min("mad4").as("mad4"),
        sum(when(lit(2L) * col("d") > lit(3L) * col("mad4"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("n"), col("med2"), col("mad4"), col("n_outliers"),
        (col("med2").cast("double") / 2.0).as("median"),
        (col("mad4").cast("double") / 4.0).as("mad"))
      .orderBy("event_type")
  }

  val madOutliersSql: String =
    """WITH q AS (
      |  SELECT event_type, event_id,
      |         CAST(floor(CAST(value AS DOUBLE)*10000 + 0.5) AS BIGINT) AS x
      |  FROM events),
      |n_tab AS (SELECT event_type, count(*) AS n FROM q GROUP BY 1),
      |r1 AS (
      |  SELECT q.event_type, q.x, n.n,
      |         row_number() OVER (PARTITION BY q.event_type ORDER BY q.x, q.event_id) AS rn
      |  FROM q JOIN n_tab n USING (event_type)),
      |med AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN rn = (n+1)//2 THEN x ELSE 0 END)
      |            + sum(CASE WHEN rn = (n+2)//2 THEN x ELSE 0 END) AS BIGINT) AS med2
      |  FROM r1 GROUP BY 1),
      |dev AS (
      |  SELECT q.event_type, q.event_id, q.x, abs(2*q.x - m.med2) AS d, m.med2
      |  FROM q JOIN med m USING (event_type)),
      |r2 AS (
      |  SELECT dev.event_type, dev.d, n.n,
      |         row_number() OVER (PARTITION BY dev.event_type ORDER BY dev.d, dev.event_id) AS rn
      |  FROM dev JOIN n_tab n USING (event_type)),
      |mad AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN rn = (n+1)//2 THEN d ELSE 0 END)
      |            + sum(CASE WHEN rn = (n+2)//2 THEN d ELSE 0 END) AS BIGINT) AS mad4
      |  FROM r2 GROUP BY 1)
      |SELECT dev.event_type, count(*) AS n, min(dev.med2) AS med2,
      |       CAST(min(mad.mad4) AS BIGINT) AS mad4,
      |       CAST(sum(CASE WHEN 2*dev.d > 3*mad.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |       CAST(min(dev.med2) AS DOUBLE) / 2.0 AS median,
      |       CAST(min(mad.mad4) AS DOUBLE) / 4.0 AS mad
      |FROM dev JOIN mad USING (event_type)
      |GROUP BY dev.event_type ORDER BY dev.event_type""".stripMargin

  /** Per-returnflag moment statistics of (quantity, extendedprice):
    * count, means, sample variance/stddev of x, and corr(x,y) — exact
    * power sums, one aggregation pass (map-side combine), double math
    * only on the final 1-row-per-group projection.
    *
    * Numeric widths are the narrowest that stay exact at scale (wide
    * DECIMAL(38) sums are the slow non-long-backed agg path). With
    * qs = 100·quantity ≤ 5·10³ and ys = 100·price ≤ 2·10⁷, per
    * returnflag at sf100 (~6·10⁸ lineitem rows):
    *   Σqs ≤ 3·10¹², Σqs² ≤ 1.5·10¹⁶, Σys ≤ 1.2·10¹⁶  → exact BIGINT
    *     (Long holds 9.2·10¹⁸ — ≥600× headroom, safe past sf10⁴);
    *   Σys² ≤ 2.4·10²³, Σqs·ys ≤ 6·10¹⁹               → DECIMAL(28,0)
    *     (holds 10²⁸ — ~10⁴× headroom; per-row products still computed
    *     in Long, only the sum is decimal). */
  def momentStats(spark: SparkSession, dir: String): DataFrame = {
    val qs = (dec2(col("l_quantity")) * 100).cast("long")
    val ys = (dec2(col("l_extendedprice")) * 100).cast("long")
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(qs).as("sxl"), sum(ys).as("syl"), sum(qs * qs).as("sxxl"),
        sum((ys * ys).cast(DecimalType(28, 0))).as("syyw"),
        sum((qs * ys).cast(DecimalType(28, 0))).as("sxyw"))
      // un-scale to true-value doubles (÷100 per factor) — IEEE-identical
      // in both engines given identical integer sums
      .select(
        col("l_returnflag"), col("n"),
        (col("sxl").cast("double") / 100).as("sx"),
        (col("syl").cast("double") / 100).as("sy"),
        (col("sxxl").cast("double") / 10000).as("sxx"),
        (col("syyw").cast("double") / 10000).as("syy"),
        (col("sxyw").cast("double") / 10000).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        (col("sx") / col("n")).as("mean_qty"),
        (col("sy") / col("n")).as("mean_price"),
        // sample variance: (Σx² − (Σx)²/n) / (n−1), exact until the divides
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_qty"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("stddev_qty"),
        // corr = (nΣxy − ΣxΣy) / (sqrt(nΣx²−(Σx)²) · sqrt(nΣy²−(Σy)²))
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
            * sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  val momentStatsSql: String =
    """WITH sums AS (
      |  SELECT l_returnflag,
      |         count(*) AS n,
      |         sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sxl,
      |         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS syl,
      |         sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
      |             * CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sxxl,
      |         sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |             * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(28,0))) AS syyw,
      |         sum(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
      |             * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(28,0))) AS sxyw
      |  FROM lineitem GROUP BY l_returnflag
      |),
      |d AS (
      |  SELECT l_returnflag, n,
      |         CAST(sxl AS DOUBLE) / 100 AS sx,
      |         CAST(syl AS DOUBLE) / 100 AS sy,
      |         CAST(sxxl AS DOUBLE) / 10000 AS sxx,
      |         CAST(syyw AS DOUBLE) / 10000 AS syy,
      |         CAST(sxyw AS DOUBLE) / 10000 AS sxy
      |  FROM sums
      |)
      |SELECT l_returnflag, n,
      |       sx / n AS mean_qty,
      |       sy / n AS mean_price,
      |       (sxx - sx * sx / n) / (n - 1) AS var_qty,
      |       sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
      |       (n * sxy - sx * sy)
      |         / (sqrt(n * sxx - sx * sx)
      |            * sqrt(n * syy - sy * sy)) AS corr_qty_price
      |FROM d ORDER BY l_returnflag""".stripMargin

  /** Event-time RANGE-frame window: per user, the rolling 5-second sum
    * of `value` (RANGE, not ROWS — peers at the same timestamp share a
    * frame; the frame is defined by the time axis, which is what a
    * rolling metric means). Partitioned by user; value summed in
    * DECIMAL so the rolling sums are order-exact, cast DOUBLE at the
    * end. */
  def rangeFrameSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-5000000L, 0L) // 5 s in µs
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        col("value").cast(DecimalType(18, 4)).as("v"))
      .withColumn("rolling_5s", sum("v").over(w).cast("double"))
      .select("user_id", "event_id", "ts_us", "rolling_5s")
      .orderBy("user_id", "ts_us", "event_id")
  }

  val rangeFrameSumSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |         CAST(value AS DECIMAL(18,4)) AS v
      |  FROM events
      |)
      |SELECT user_id, event_id, ts_us,
      |       CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts_us
      |                         RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS rolling_5s
      |FROM e ORDER BY user_id, ts_us, event_id""".stripMargin

  /** Cumulative distinct users per event type over hourly time — the
    * "unique users to date" growth curve. A naive windowed
    * COUNT(DISTINCT) is non-decomposable (per-row distinct state grows
    * with history); the exact scalable identity is: distinct-to-hour-h
    * = Σ over hours ≤ h of FIRST-SEEN counts, because each user
    * contributes exactly once, at its min hour. That turns the query
    * into two partial+final aggregates (first-seen per (type, user),
    * new-user counts per (type, hour)) plus one cumulative-sum window
    * over HOUR-GRAIN rows — window input is bounded by the time range,
    * not the event count, no matter how large the corpus. */
  def cumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val ev = t(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        expr(s"ts div $hourNs").as("hour"))
    val firsts = ev.groupBy("event_type", "user_id")
      .agg(min("hour").as("first_hour"))
    val newPerHour = firsts
      .groupBy(col("event_type"), col("first_hour").as("hour"))
      .agg(count(lit(1)).as("n_new"))
    val hours = ev.select("event_type", "hour").distinct()
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hours.join(newPerHour, Seq("event_type", "hour"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_users", sum("n_new").over(w))
      .select(col("event_type"), (col("hour") * 3600L).as("hour_start_s"),
        col("n_new"), col("cum_users"))
      .orderBy("event_type", "hour_start_s")
  }

  val cumulativeUsersSql: String =
    """WITH ev AS (
      |  SELECT event_type, user_id, epoch_ns(ts) // 3600000000000 AS hour
      |  FROM events
      |), firsts AS (
      |  SELECT event_type, user_id, min(hour) AS first_hour
      |  FROM ev GROUP BY 1, 2
      |), newph AS (
      |  SELECT event_type, first_hour AS hour, count(*) AS n_new
      |  FROM firsts GROUP BY 1, 2
      |), hours AS (
      |  SELECT DISTINCT event_type, hour FROM ev
      |)
      |SELECT h.event_type, h.hour * 3600 AS hour_start_s,
      |       coalesce(n.n_new, 0)::BIGINT AS n_new,
      |       CAST(sum(coalesce(n.n_new, 0)) OVER (
      |              PARTITION BY h.event_type ORDER BY h.hour
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cum_users
      |FROM hours h LEFT JOIN newph n USING (event_type, hour)
      |ORDER BY event_type, hour_start_s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_value_family" -> valueWindows,
    "window_range_frame" -> rangeFrameSum,
    "window_cumulative_users" -> cumulativeUsers,
    "stat_moments" -> momentStats,
    "stat_mad_outliers" -> madOutliers)

  val oracles: Map[String, String] = Map(
    "window_value_family" -> valueWindowsSql,
    "window_range_frame" -> rangeFrameSumSql,
    "window_cumulative_users" -> cumulativeUsersSql,
    "stat_moments" -> momentStatsSql,
    "stat_mad_outliers" -> madOutliersSql)
}
