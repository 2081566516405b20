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

  /** Deterministic per-epoch reshuffle of the document corpus — the
    * delivery-side operator of a training pipeline: each epoch must
    * visit every document exactly once in a fresh pseudorandom order,
    * reproducibly, WITHOUT a global sort. Documents hash to one of 16
    * shards per epoch (the unit a trainer streams), and the intra-shard
    * order is a per-shard local sort by a second-level hash. The output
    * audits the shuffle: per (epoch, shard) the document count, an
    * order-independent XOR of the member hashes (membership check), and
    * a rank-weighted checksum (order check — any transposition changes
    * it).
    *
    * Scale shape: the explode is map-side (×E epochs), the only shuffle
    * is the (epoch, shard)-keyed exchange every trainer needs anyway,
    * and each window partition is one shard (corpus/16 rows) — the
    * 100 TB epoch shuffle is exactly this plan with more shards. */
  def epochShuffle(spark: SparkSession, dir: String,
                   epochs: Int = 4, shards: Int = 16): DataFrame = {
    val h = graft.functions.Portable.hash60(
      concat_ws("_", lit("epshuf"), col("epoch"), col("doc_id")))
    val assigned = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(0L), lit(epochs - 1L))).as("epoch"))
      .withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
    val w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    assigned
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("xor_h"),
        sum(col("rk") * pmod(col("h"), lit(997L))).as("order_sum"))
      .orderBy("epoch", "shard")
  }

  def epochShuffleSql(epochs: Int = 4, shards: Int = 16): String =
    s"""WITH assigned AS (
       |  SELECT d.doc_id, e.epoch,
       |         CAST(('0x' || substr(md5('epshuf_' || e.epoch || '_' || d.doc_id), 1, 15)) AS BIGINT) AS h
       |  FROM documents d CROSS JOIN (SELECT unnest(range(0, $epochs)) AS epoch) e
       |), ranked AS (
       |  SELECT epoch, h % $shards AS shard, h,
       |         row_number() OVER (PARTITION BY epoch, h % $shards ORDER BY h, doc_id) AS rk
       |  FROM assigned
       |)
       |SELECT epoch, shard, count(*) AS n_docs,
       |       CAST(bit_xor(h) AS BIGINT) AS xor_h,
       |       CAST(sum(rk * (h % 997)) AS BIGINT) AS order_sum
       |FROM ranked GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin

  /** Poisson-bootstrap confidence interval for the mean event value —
    * THE bootstrap that works at 100 TB: instead of resampling n rows
    * with replacement (which needs global coordination), every row
    * contributes an independent Poisson(1) weight per replicate
    * (Chamandy et al. 2012, "Estimating uncertainty for massive data
    * streams"). Weights come from a deterministic inverse-CDF on a
    * 60-bit hash, so both engines draw identical replicates. Output:
    * one row per replicate with its exact integer weighted moments, the
    * scaled mean, and the replicate's rank — rank 1 / R are the
    * bootstrap CI endpoints.
    *
    * Scale shape: the ×R explode is map-side and collapses to R cells
    * per partition before the one 32-cell shuffle (partial aggregation
    * does the work); the ranking window sees R rows total. */
  def bootstrapCi(spark: SparkSession, dir: String, reps: Int = 32): DataFrame = {
    // cumulative Poisson(1) CDF × 1e6, floored: P(X<=k) for k = 0..5;
    // u >= all thresholds → weight 6 (truncation error < 1e-4)
    val cdf = Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L)
    val u = pmod(graft.functions.Portable.hash60(
      concat_ws("_", lit("boot"), col("r"), col("event_id"))), lit(1000000L))
    val weight = cdf.zipWithIndex.foldRight(lit(cdf.length.toLong)) {
      case ((thr, k), els) => when(col("u") < thr, k.toLong).otherwise(els)
    }
    val reps32 = t(spark, dir, "events")
      .select(col("event_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("v"),
        explode(sequence(lit(0L), lit(reps - 1L))).as("r"))
      .withColumn("u", u)
      .withColumn("w", weight)
      .groupBy("r")
      .agg(sum("w").as("n_w"), sum(col("w") * col("v")).as("sum_wv"))
      .withColumn("mean_micro", expr("(10000 * sum_wv) DIV n_w"))
    reps32
      .withColumn("rank",
        row_number().over(Window.orderBy("mean_micro", "r")).cast("long"))
      .orderBy("r")
  }

  def bootstrapCiSql(reps: Int = 32): String =
    s"""WITH drawn AS (
       |  SELECT r.r, ev.event_id,
       |         CAST(CAST(ev.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
       |         CAST(('0x' || substr(md5('boot_' || r.r || '_' || ev.event_id), 1, 15)) AS BIGINT)
       |           % 1000000 AS u
       |  FROM events ev CROSS JOIN (SELECT unnest(range(0, $reps)) AS r) r
       |), weighted AS (
       |  SELECT r, v,
       |         CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
       |              WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
       |              WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
       |              ELSE 6 END AS w
       |  FROM drawn
       |), cells AS (
       |  SELECT r, CAST(sum(w) AS BIGINT) AS n_w, CAST(sum(w * v) AS BIGINT) AS sum_wv
       |  FROM weighted GROUP BY r
       |), means AS (
       |  SELECT r, n_w, sum_wv, (10000 * sum_wv) // n_w AS mean_micro FROM cells
       |)
       |SELECT r, n_w, sum_wv, mean_micro,
       |       CAST(row_number() OVER (ORDER BY mean_micro, r) AS BIGINT) AS rank
       |FROM means ORDER BY r""".stripMargin

  /** Gini coefficient + Lorenz-curve deciles of order value — the
    * concentration report ("what share of revenue do the bottom k/10 of
    * orders carry") that skew-aware capacity planning reads. Computed
    * from GROUPED data on a value-resolution-bounded grid (prices
    * quantized to 10-currency-unit cells), the same bounded-grid trick
    * as the KS statistic: with cells sorted by value, Σ rank·x over the
    * expanded rows equals Σ_cells qv·(c·cumN_prev + c(c+1)/2) — all
    * exact BIGINTs — and G = (2S − (N+1)V) / (N·V) emerges as one
    * integer division at milli resolution (denominator pre-shrunk
    * `DIV 1000` to keep the numerator inside BIGINT at 8× scale).
    *
    * Scale shape: one partial+final agg to the price grid, windows over
    * GRID rows (bounded by value resolution, never table size), and a
    * 10-row decile probe via min_by. */
  def giniLorenz(spark: SparkSession, dir: String): DataFrame = {
    val units10 = expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 1000")
    val cells = t(spark, dir, "orders")
      .select(units10.as("qv"))
      .groupBy("qv").agg(count(lit(1)).as("c"))
    val tot = cells.agg(sum("c").as("nn"), sum(col("c") * col("qv")).as("vv"))
    val w = Window.orderBy("qv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("cum_n", sum("c").over(w))
      .withColumn("cum_v", sum(col("c") * col("qv")).over(w))
    val s = cum.agg(
      sum(col("qv") * (col("c") * (col("cum_n") - col("c"))
        + expr("(c * (c + 1)) DIV 2"))).as("s"))
    val gini = s.crossJoin(broadcast(tot))
      .select(col("nn"), col("vv"),
        expr("(2 * s - (nn + 1) * vv) DIV ((nn * vv) DIV 1000)").as("gini_milli"))
    val deciles = cum.crossJoin(broadcast(tot))
      .crossJoin(broadcast(
        spark.range(1, 11).select(col("id").as("decile"))))
      .filter(col("cum_n") * 10 >= col("decile") * col("nn"))
      .groupBy("decile")
      .agg(min_by(col("cum_v"), col("qv")).as("cum_v_at"))
    deciles.crossJoin(broadcast(gini))
      .select(col("decile"),
        expr("(1000 * cum_v_at) DIV vv").as("lorenz_permille"),
        col("gini_milli"))
      .orderBy("decile")
  }

  val giniLorenzSql: String =
    """WITH cells AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000 AS qv,
      |         count(*) AS c
      |  FROM orders GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS nn, CAST(sum(c * qv) AS BIGINT) AS vv FROM cells
      |), cum AS (
      |  SELECT qv, c,
      |         CAST(sum(c) OVER (ORDER BY qv
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
      |         CAST(sum(c * qv) OVER (ORDER BY qv
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_v
      |  FROM cells
      |), s AS (
      |  SELECT CAST(sum(qv * (c * (cum_n - c) + (c * (c + 1)) // 2)) AS BIGINT) AS s FROM cum
      |), gini AS (
      |  SELECT t.nn, t.vv, (2 * s.s - (t.nn + 1) * t.vv) // ((t.nn * t.vv) // 1000) AS gini_milli
      |  FROM s CROSS JOIN tot t
      |), deciles AS (
      |  SELECT k.decile, min_by(cum.cum_v, cum.qv) AS cum_v_at
      |  FROM cum CROSS JOIN tot t
      |       CROSS JOIN (SELECT unnest(range(1, 11)) AS decile) k
      |  WHERE cum.cum_n * 10 >= k.decile * t.nn
      |  GROUP BY k.decile
      |)
      |SELECT d.decile, (1000 * d.cum_v_at) // g.vv AS lorenz_permille, g.gini_milli
      |FROM deciles d CROSS JOIN gini g
      |ORDER BY decile""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_gini" -> giniLorenz,
    "dq_benford" -> benfordDigits,
    "window_streaks" -> activityStreaks,
    "pipeline_epoch_shuffle" -> ((s, d) => epochShuffle(s, d)),
    "stat_bootstrap_ci" -> ((s, d) => bootstrapCi(s, d)))

  val oracles: Map[String, String] = Map(
    "stat_gini" -> giniLorenzSql,
    "dq_benford" -> benfordDigitsSql,
    "window_streaks" -> activityStreaksSql,
    "pipeline_epoch_shuffle" -> epochShuffleSql(),
    "stat_bootstrap_ci" -> bootstrapCiSql())
}
