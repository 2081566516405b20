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

  /** Interval (range) join: for every 'click' event, the same-user
    * events strictly inside the following 30-minute window — the
    * point-in-interval join class the reference lacks entirely.
    *
    * Scale path: bucketize time by the window width W. An interval
    * (c, c+W] spans exactly the two buckets {c div W, c div W + 1}, so
    * the probe (click) side explodes ≤2× and the join is an EQUI-join
    * on (user, bucket) with an exact range refine — never an
    * inequality/theta join (which Spark would plan as a nested-loop).
    * All interval arithmetic is integer µs so the DuckDB theta-join
    * oracle computes identical boundaries. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = 1800L * 1000000L // 30 min in µs
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        col("value"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts_us").as("click_us"))
    val probes = clicks.withColumn("bucket",
      explode(array(expr(s"click_us div $w"), expr(s"click_us div $w") + 1)))
    val others = ev
      .select(col("user_id"), col("ts_us").as("other_us"), col("value"),
        expr(s"ts_us div $w").as("bucket"))
    val agg = probes.join(others, Seq("user_id", "bucket"))
      .filter(col("other_us") > col("click_us") && col("other_us") <= col("click_us") + w)
      .groupBy("click_id")
      .agg(count(lit(1)).as("n_follow"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_follow_value"))
    clicks.join(agg, Seq("click_id"), "left")
      .select(col("user_id"), col("click_id"), col("click_us"),
        coalesce(col("n_follow"), lit(0L)).as("n_follow"),
        col("sum_follow_value"))
      .orderBy("user_id", "click_id")
  }

  val rangeJoinSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events
      |), clicks AS (
      |  SELECT user_id, event_id AS click_id, ts_us AS click_us
      |  FROM ev WHERE event_type = 'click'
      |), j AS (
      |  SELECT c.click_id, count(*) AS n_follow,
      |         CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_follow_value
      |  FROM clicks c JOIN ev e
      |    ON c.user_id = e.user_id
      |   AND e.ts_us > c.click_us AND e.ts_us <= c.click_us + 1800000000
      |  GROUP BY c.click_id
      |)
      |SELECT c.user_id, c.click_id, c.click_us,
      |       coalesce(j.n_follow, 0)::BIGINT AS n_follow, j.sum_follow_value
      |FROM clicks c LEFT JOIN j USING (click_id)
      |ORDER BY c.user_id, c.click_id""".stripMargin

  /** A PURE interval join (no equi key — the shape Spark plans as a
    * nested loop) rewritten to the bucketed form by the
    * [[graft.plans.BucketizeRangeJoin]] optimizer rule — the (c)-tier
    * extension path (custom Rule via SparkSessionExtensions) on the
    * driver board: platform-wide events in the 30 minutes after each
    * click. Runs in a child session so the rule registration cannot
    * leak into sibling harness queries.
    *
    * SCALE GUIDANCE: prefer the KEYED shape ([[rangeJoin]],
    * `ts_range_join`) whenever a partitioning key exists. The keyless
    * form's OUTPUT is density-quadratic on any engine — the 8× fixture
    * measured exactly 64× the pairs for 8× the data (1.38 M → 88.2 M,
    * DuckDB-verified; BASELINE.md), because every click matches every
    * in-window event platform-wide. The rule keeps the JOIN itself
    * bucketed (never a nested loop) and per-pair throughput actually
    * improved 2.7× at 8×, but no plan can make a quadratic result set
    * linear: at 100 TB the keyed variant's (user, bucket) key is what
    * bounds both output and shuffle. Keep this shape for genuinely
    * global windows on filtered/low-density streams. */
  def rangeJoinViaRule(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    graft.plans.GraftExtensions.register(spark)
    val w = 1800L * 1000000L
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        col("value"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts_us").as("click_us"))
    val others = ev.select(col("ts_us").as("other_us"), col("value"))
    val agg = clicks.join(others,
        col("other_us") > col("click_us") &&
          col("other_us") <= col("click_us") + lit(w))
      .groupBy("click_id")
      .agg(count(lit(1)).as("n_follow"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_follow_value"))
    clicks.join(agg, Seq("click_id"), "left")
      .select(col("c_user").as("user_id"), col("click_id"), col("click_us"),
        coalesce(col("n_follow"), lit(0L)).as("n_follow"),
        col("sum_follow_value"))
      .orderBy("user_id", "click_id")
  }

  val rangeJoinViaRuleSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events
      |), clicks AS (
      |  SELECT user_id, event_id AS click_id, ts_us AS click_us
      |  FROM ev WHERE event_type = 'click'
      |), j AS (
      |  SELECT c.click_id, count(*) AS n_follow,
      |         CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_follow_value
      |  FROM clicks c JOIN ev e
      |    ON e.ts_us > c.click_us AND e.ts_us <= c.click_us + 1800000000
      |  GROUP BY c.click_id
      |)
      |SELECT c.user_id, c.click_id, c.click_us,
      |       coalesce(j.n_follow, 0)::BIGINT AS n_follow, j.sum_follow_value
      |FROM clicks c LEFT JOIN j USING (click_id)
      |ORDER BY c.user_id, c.click_id""".stripMargin

  /** Sliding-window aggregation (1 h windows every 30 min): each event
    * lies in exactly two windows, so the assignment is a bounded 2×
    * explode of the two covering starts — never a range join. Batch
    * form of `window(col, "1 hour", "30 minutes")`. */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"), col("value"),
        expr("ts div 1800000000000").as("k"))
      .select(col("event_type"), col("value"),
        explode(array(col("k") * 1800, (col("k") - 1) * 1800)).as("window_start"))
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .orderBy("window_start", "event_type")

  val slidingAggSql: String =
    """WITH k AS (
      |  SELECT event_type, value, epoch_ns(ts) // 1800000000000 AS k FROM events
      |), win AS (
      |  SELECT event_type, value, unnest([k * 1800, (k - 1) * 1800]) AS window_start FROM k
      |)
      |SELECT window_start, event_type, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM win GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  /** The as-of join through the NATIVE custom operator (plans/AsOfJoin:
    * LogicalPlan + Strategy + merge-join SparkPlan), with the STANDARD
    * as-of semantics: latest right row with `rt <= lt` (pandas
    * merge_asof "backward", equal timestamps match). Note this differs
    * from `ts_asof_join`'s window composition on exact-timestamp ties —
    * the composition's union ordering excludes a same-ts error with a
    * larger event_id — so the native query carries its OWN inequality
    * oracle, not the composition's. Matching runs at µs resolution on
    * both engines (DuckDB only sees µs), which also makes ties
    * payload-deterministic: the payload IS the compared timestamp. */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("click_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), expr("ts div 1000").as("err_us"),
        expr("ts div 1000").as("err_us_payload"))
    graft.plans.AsOfJoin.asof(clicks, errors,
        key = "user_id", ts = "click_us", rightTsName = "err_us",
        payload = "err_us_payload", outName = "asof_error_us")
      .select(col("user_id"), col("event_id"), col("click_us"), col("asof_error_us"))
      .orderBy("user_id", "event_id")
  }

  /** at-or-before inequality form (max error µs ≤ click µs per user) —
    * the textbook as-of definition the native operator implements. */
  val asofJoinNativeSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events
      |), clicks AS (
      |  SELECT user_id, event_id, us AS click_us FROM ev WHERE event_type = 'click'
      |), errors AS (
      |  SELECT user_id, us AS err_us FROM ev WHERE event_type = 'error'
      |)
      |SELECT c.user_id, c.event_id, c.click_us, max(e.err_us) AS asof_error_us
      |FROM clicks c LEFT JOIN errors e
      |  ON c.user_id = e.user_id AND e.err_us <= c.click_us
      |GROUP BY c.user_id, c.event_id, c.click_us
      |ORDER BY c.user_id, c.event_id""".stripMargin

  /** The native as-of join with a MAX-STALENESS tolerance (pandas
    * merge_asof `tolerance`): the latest same-user error at or before
    * the click, but only within the preceding 30 minutes — matches
    * staler than that are nulled. The oracle is the windowed inequality
    * form: the latest at-or-before match is also the latest inside
    * [click − tol, click], so bounding the join range is equivalent. */
  def asofJoinTolerance(spark: SparkSession, dir: String): DataFrame = {
    val tolUs = 1800L * 1000000L
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("click_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), expr("ts div 1000").as("err_us"),
        expr("ts div 1000").as("err_us_payload"))
    graft.plans.AsOfJoin.asof(clicks, errors,
        key = "user_id", ts = "click_us", rightTsName = "err_us",
        payload = "err_us_payload", outName = "recent_error_us",
        tolerance = tolUs)
      .select(col("user_id"), col("event_id"), col("click_us"), col("recent_error_us"))
      .orderBy("user_id", "event_id")
  }

  val asofJoinToleranceSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events
      |), clicks AS (
      |  SELECT user_id, event_id, us AS click_us FROM ev WHERE event_type = 'click'
      |), errors AS (
      |  SELECT user_id, us AS err_us FROM ev WHERE event_type = 'error'
      |)
      |SELECT c.user_id, c.event_id, c.click_us, max(e.err_us) AS recent_error_us
      |FROM clicks c LEFT JOIN errors e
      |  ON c.user_id = e.user_id AND e.err_us <= c.click_us
      | AND e.err_us >= c.click_us - 1800000000
      |GROUP BY c.user_id, c.event_id, c.click_us
      |ORDER BY c.user_id, c.event_id""".stripMargin

  /** Hourly downsample with last-observation-carried-forward — the
    * resample/gap-fill operator every time-series store offers. Each
    * user's grid spans their [first, last] event hours; the grid rows
    * (value-NULL) union with the raw events and one partitioned
    * LOCF window (`last(value) ignoreNulls`) fills each grid point
    * with the latest value at-or-before the hour start. Ties at the
    * boundary: the event sorts before the grid row (is_grid breaks
    * the tie), so an event exactly on the hour is carried into it.
    * Scale: the grid explode is bounded by each user's time span over
    * the grid step (explicitly a parameter to size), the union is
    * map-side, and the single window is partitioned by user — nothing
    * global. Values pass through unchanged (no arithmetic), so the
    * doubles are trivially exact cross-engine.
    *
    * The engine-side `ts` is truncated to µs (div 1000, scaled back to
    * ns) BEFORE ordering: DuckDB reads the parquet TIMESTAMP(NANOS)
    * column at µs precision, so an event with a sub-µs component just
    * past an hour boundary would otherwise be carried into the grid
    * point by the oracle but not here. The harness generator only emits
    * µs-aligned timestamps, but the tie rule must not depend on that. */
  def downsampleLocf(spark: SparkSession, dir: String): DataFrame =
    downsampleLocfFrom(t(spark, dir, "events")
      .select(col("user_id"), expr("(ts div 1000) * 1000").as("tns"), col("value")))

  /** Core on any (user_id, tns, value) frame — see [[downsampleLocf]]. */
  private[graft] def downsampleLocfFrom(ev: DataFrame): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val grid = ev.groupBy("user_id")
      .agg(min(expr("tns div " + hourNs)).as("h0"),
        max(expr("tns div " + hourNs)).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
      .select(col("user_id"), (col("hour") * hourNs).as("ord_ns"),
        lit(1).as("is_grid"), lit(null).cast("double").as("value"))
    val pts = ev.select(col("user_id"), col("tns").as("ord_ns"),
      lit(0).as("is_grid"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("ord_ns", "is_grid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.unionAll(grid)
      .withColumn("locf_value", last("value", ignoreNulls = true).over(w))
      .filter(col("is_grid") === 1)
      .select(col("user_id"), expr("ord_ns div 1000").as("hour_start_us"),
        col("locf_value"))
      .orderBy("user_id", "hour_start_us")
  }

  val downsampleLocfSql: String =
    """WITH ev AS (
      |  -- (// 1000) * 1000 mirrors the Spark side's (ts div 1000) * 1000
      |  -- so both engines are pinned to microsecond grain even if a
      |  -- nanos-precision events generation ships again
      |  SELECT user_id, (epoch_ns(ts) // 1000) * 1000 AS tns, value FROM events
      |), bounds AS (
      |  SELECT user_id, min(tns // 3600000000000) AS h0,
      |         max(tns // 3600000000000) AS h1
      |  FROM ev GROUP BY user_id
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1)) * 3600000000000 AS ord_ns,
      |         1 AS is_grid, CAST(NULL AS DOUBLE) AS value
      |  FROM bounds
      |), pts AS (
      |  SELECT user_id, tns AS ord_ns, 0 AS is_grid, value FROM ev
      |), unioned AS (
      |  SELECT * FROM pts UNION ALL SELECT * FROM grid
      |), filled AS (
      |  SELECT user_id, ord_ns, is_grid,
      |         last_value(value IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ord_ns, is_grid
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
      |  FROM unioned
      |)
      |SELECT user_id, ord_ns // 1000 AS hour_start_us, locf_value
      |FROM filled WHERE is_grid = 1
      |ORDER BY user_id, hour_start_us""".stripMargin

  /** Linear-interpolation gap fill on the same hourly grid as
    * [[downsampleLocf]] — the other half of time-series resampling
    * (LOCF for step signals, linear for continuous ones). Each grid
    * point takes prev + (next − prev)·(g − t_prev)/(t_next − t_prev)
    * between its neighboring samples; leading grid points (before the
    * user's first sample) back-fill from the next sample, trailing ones
    * carry the last sample forward.
    *
    * Same single-shuffle shape as LOCF: union the samples with the grid
    * rows, one partitioned ordered window pass in each direction
    * (`last ignoreNulls` over preceding, `first ignoreNulls` over
    * following). A sample at exactly a grid instant sorts BEFORE the
    * grid row ((ord_ns, is_grid) order), so it lands in the prev side
    * with zero weight → the sample value verbatim, and t_next > g ≥
    * t_prev keeps the denominator strictly positive. The interpolation
    * itself is the identical IEEE double expression in both engines
    * (integer ns deltas cast to double, one divide/multiply/add). */
  def interpolateGrid(spark: SparkSession, dir: String): DataFrame =
    interpolateGridFrom(t(spark, dir, "events")
      .select(col("user_id"), expr("(ts div 1000) * 1000").as("tns"), col("value")))

  /** Core on any (user_id, tns, value) frame — see [[interpolateGrid]]. */
  private[graft] def interpolateGridFrom(ev: DataFrame): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val grid = ev.groupBy("user_id")
      .agg(min(expr("tns div " + hourNs)).as("h0"),
        max(expr("tns div " + hourNs)).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
      .select(col("user_id"), (col("hour") * hourNs).as("ord_ns"),
        lit(1).as("is_grid"), lit(null).cast("double").as("value"))
    val pts = ev.select(col("user_id"), col("tns").as("ord_ns"),
      lit(0).as("is_grid"), col("value"))
    val wPrev = Window.partitionBy("user_id").orderBy("ord_ns", "is_grid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next" side as a RUNNING frame over the reversed ordering: a
    // suffix in ascending order (current row included) is exactly a
    // running prefix in descending order. Spark executes running
    // frames in O(n) per partition, while a currentRow→unboundedFollowing
    // frame rescans the suffix per row — O(n²), measured 7.6 s vs ~1 s
    // on the sf0.1 board. Costs one extra in-partition sort, no shuffle.
    val wNext = Window.partitionBy("user_id")
      .orderBy(col("ord_ns").desc, col("is_grid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.unionAll(grid)
      .withColumn("pt_ns", when(col("is_grid") === 0, col("ord_ns")))
      .withColumn("pv", last("value", ignoreNulls = true).over(wPrev))
      .withColumn("pt", last("pt_ns", ignoreNulls = true).over(wPrev))
      .withColumn("nv", last("value", ignoreNulls = true).over(wNext))
      .withColumn("nt", last("pt_ns", ignoreNulls = true).over(wNext))
      .filter(col("is_grid") === 1)
      .select(col("user_id"), expr("ord_ns div 1000").as("hour_start_us"),
        when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("ord_ns") - col("pt")).cast("double") /
              (col("nt") - col("pt")).cast("double")))
          .as("interp_value"))
      .orderBy("user_id", "hour_start_us")
  }

  val interpolateGridSql: String =
    """WITH ev AS (
      |  -- microsecond-grain pin mirroring the Spark side — see
      |  -- downsampleLocfSql; keeps interpolation weights identical under
      |  -- a nanos-precision events generation
      |  SELECT user_id, (epoch_ns(ts) // 1000) * 1000 AS tns, value FROM events
      |), bounds AS (
      |  SELECT user_id, min(tns // 3600000000000) AS h0,
      |         max(tns // 3600000000000) AS h1
      |  FROM ev GROUP BY user_id
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1)) * 3600000000000 AS ord_ns,
      |         1 AS is_grid, CAST(NULL AS DOUBLE) AS value
      |  FROM bounds
      |), pts AS (
      |  SELECT user_id, tns AS ord_ns, 0 AS is_grid, value FROM ev
      |), unioned AS (
      |  SELECT *, CASE WHEN is_grid = 0 THEN ord_ns END AS pt_ns
      |  FROM (SELECT * FROM pts UNION ALL SELECT * FROM grid)
      |), filled AS (
      |  SELECT user_id, ord_ns, is_grid,
      |         last_value(value IGNORE NULLS) OVER wp AS pv,
      |         last_value(pt_ns IGNORE NULLS) OVER wp AS pt,
      |         first_value(value IGNORE NULLS) OVER wn AS nv,
      |         first_value(pt_ns IGNORE NULLS) OVER wn AS nt
      |  FROM unioned
      |  WINDOW wp AS (PARTITION BY user_id ORDER BY ord_ns, is_grid
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wn AS (PARTITION BY user_id ORDER BY ord_ns, is_grid
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT user_id, ord_ns // 1000 AS hour_start_us,
      |       CASE WHEN pv IS NULL THEN nv
      |            WHEN nv IS NULL THEN pv
      |            ELSE pv + (nv - pv) *
      |                 (CAST(ord_ns - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
      |       END AS interp_value
      |FROM filled WHERE is_grid = 1
      |ORDER BY user_id, hour_start_us""".stripMargin

  /** Trailing-window anomaly detection: flag an event whose value sits
    * more than 3 sample standard deviations from the mean of the SAME
    * user's previous `n` events (full windows only). The monitoring/
    * fraud-detection shape: one partitioned ordered window per user —
    * one shuffle on user_id, per-row state bounded by the n-row frame,
    * no self-join, which is exactly how it holds at 100 TB.
    *
    * Exactness: values quantize to 1e-4 fixed-point BIGINTs; with
    * integer frame sums s1=Σx, s2=Σx², the population z-score is
    * z = (n·x−s1)/sqrt(n·s2−s1²), so the outlier PREDICATE
    * (n·x−s1)² > 9·(n·s2−s1²) is pure BIGINT arithmetic (no float
    * compare can flip a flag), and the reported z is one integer
    * division through correctly-rounded sqrt — the identical double in
    * both engines. Bounds: |x| ≤ 6e6 (value ≤ 560.21), so every
    * intermediate stays far below 2^63 with n=20. */
  def zscoreOutliers(spark: SparkSession, dir: String, n: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(-n, -1)
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        floor(col("value").cast("double") * 10000d + 0.5d).cast("long").as("x"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("x"),
        count(lit(1)).over(w).as("n_prev"),
        sum(col("x")).over(w).as("s1"),
        sum(col("x") * col("x")).over(w).as("s2"))
      .filter(col("n_prev") === n && (col("n_prev") * col("s2") - col("s1") * col("s1")) > 0)
      .withColumn("num", col("n_prev") * col("x") - col("s1"))
      .withColumn("den", col("n_prev") * col("s2") - col("s1") * col("s1"))
      .filter(col("num") * col("num") > lit(9L) * col("den"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("x").as("value_q"),
        (col("num").cast("double") / sqrt(col("den").cast("double"))).as("zscore"))
      .orderBy("event_id")
  }

  def zscoreOutliersSql(n: Int = 20): String =
    s"""WITH q AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |         CAST(floor(CAST(value AS DOUBLE)*10000 + 0.5) AS BIGINT) AS x
       |  FROM events),
       |w AS (
       |  SELECT event_id, user_id, ts_us, x,
       |         count(*) OVER win AS n_prev,
       |         sum(x) OVER win AS s1,
       |         sum(x*x) OVER win AS s2
       |  FROM q WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
       |                        ROWS BETWEEN $n PRECEDING AND 1 PRECEDING))
       |SELECT event_id, user_id, ts_us, x AS value_q,
       |       CAST(n_prev*x - s1 AS DOUBLE) / sqrt(CAST(n_prev*s2 - s1*s1 AS DOUBLE)) AS zscore
       |FROM w
       |WHERE n_prev = $n AND (n_prev*s2 - s1*s1) > 0
       |  AND (n_prev*x - s1)*(n_prev*x - s1) > 9*(n_prev*s2 - s1*s1)
       |ORDER BY event_id""".stripMargin

  /** Exponentially-weighted moving average with EXACT dyadic weights:
    * over each user's trailing 8 events (current + 7 preceding), weight
    * 2^(7−j) at lag j — a half-life of one step — so the weighted sum is
    * pure BIGINT arithmetic (numerator Σ x·2^(7−j), denominator
    * 2^8−1 = 255) and the reported smooth value is ONE double division,
    * identical in both engines. The trailing-smoother member of the ts
    * family beside LOCF/interpolate/z-score: per-user ordered window,
    * one shuffle on user_id, no self-join, frame-bounded state — the
    * 100 TB monitoring shape. A truncated-geometric window is the
    * standard streaming approximation of the open-ended EWMA (the full
    * recursion carries unbounded state; 8 dyadic taps ≍ α=1/2 with
    * <0.4% truncated mass). Full frames only (rows with ≥7
    * predecessors), so every output has the same weight profile. */
  def ewmaSmooth(spark: SparkSession, dir: String, taps: Int = 8): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val num = (0 until taps).map(j =>
      lag(col("x"), j).over(ord) * lit(1L << (taps - 1 - j))).reduce(_ + _)
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        floor(col("value").cast("double") * 10000d + 0.5d).cast("long").as("x"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("x"),
        row_number().over(ord).as("rn"), num.as("ewma_num"))
      .filter(col("rn") >= taps)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("x").as("value_q"),
        col("ewma_num"),
        (col("ewma_num").cast("double") / lit(((1L << taps) - 1).toDouble)).as("ewma"))
      .orderBy("event_id")
  }

  def ewmaSmoothSql(taps: Int = 8): String = {
    val num = (0 until taps).map(j =>
      s"lag(x, $j) OVER win * ${1L << (taps - 1 - j)}").mkString(" + ")
    s"""WITH q AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |         CAST(floor(CAST(value AS DOUBLE)*10000 + 0.5) AS BIGINT) AS x
       |  FROM events),
       |w AS (
       |  SELECT event_id, user_id, ts_us, x,
       |         row_number() OVER win AS rn,
       |         $num AS ewma_num
       |  FROM q WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id))
       |SELECT event_id, user_id, ts_us, x AS value_q, ewma_num,
       |       CAST(ewma_num AS DOUBLE) / ${((1L << taps) - 1).toDouble} AS ewma
       |FROM w WHERE rn >= $taps
       |ORDER BY event_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_ewma_smooth" -> ((s, d) => ewmaSmooth(s, d)),
    "ts_asof_join" -> asofJoin,
    "ts_asof_join_native" -> asofJoinNative,
    "ts_asof_tolerance" -> asofJoinTolerance,
    "ts_range_join" -> rangeJoin,
    "ts_range_join_rule" -> rangeJoinViaRule,
    "ts_downsample_locf" -> downsampleLocf,
    "ts_interpolate" -> interpolateGrid,
    "ts_zscore_outliers" -> ((s, d) => zscoreOutliers(s, d)),
    "agg_sliding_events" -> slidingAgg,
    "agg_grouping_sets" -> groupingSets)

  val oracles: Map[String, String] = Map(
    "ts_ewma_smooth" -> ewmaSmoothSql(),
    "ts_asof_join" -> asofJoinSql,
    "ts_asof_join_native" -> asofJoinNativeSql,
    "ts_asof_tolerance" -> asofJoinToleranceSql,
    "ts_range_join" -> rangeJoinSql,
    "ts_range_join_rule" -> rangeJoinViaRuleSql,
    "ts_downsample_locf" -> downsampleLocfSql,
    "ts_interpolate" -> interpolateGridSql,
    "ts_zscore_outliers" -> zscoreOutliersSql(),
    "agg_sliding_events" -> slidingAggSql,
    "agg_grouping_sets" -> groupingSetsSql)
}
