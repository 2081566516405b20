package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Tables.t

/** Remaining relational surface: EXISTS decorrelation, INTERSECT,
  * deterministic nested-type aggregation, UNPIVOT, and LATERAL
  * (correlated derived-table) joins.
  */
object Relational5 {

  /** Correlated EXISTS / NOT EXISTS in one pass: orders tagged by
    * whether any line item ships after the order date (EXISTS
    * decorrelates to a semi-join, NOT EXISTS to an anti-join — both
    * existence joins, no row multiplication). */
  def existsSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("v_r5_orders")
    t(spark, dir, "lineitem").createOrReplaceTempView("v_r5_lineitem")
    spark.sql(
      """SELECT o_orderkey, o_orderstatus,
        |       EXISTS (SELECT 1 FROM v_r5_lineitem l
        |               WHERE l.l_orderkey = o.o_orderkey
        |                 AND l.l_shipdate > o.o_orderdate) AS has_late_ship
        |FROM v_r5_orders o
        |ORDER BY o_orderkey""".stripMargin)
  }

  val existsSubquerySql: String =
    """SELECT o_orderkey, o_orderstatus,
      |       EXISTS (SELECT 1 FROM lineitem l
      |               WHERE l.l_orderkey = o.o_orderkey
      |                 AND l.l_shipdate > o.o_orderdate) AS has_late_ship
      |FROM orders o
      |ORDER BY o_orderkey""".stripMargin

  /** INTERSECT (set semantics): nation keys that have BOTH customers
    * and suppliers. Plans as a distinct-ing semi-join — no row blowup. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_nationkey").cast("long").as("nationkey"))
      .intersect(t(spark, dir, "supplier").select(col("s_nationkey").cast("long").as("nationkey")))
      .orderBy("nationkey")

  val setIntersectSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      |INTERSECT
      |SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** Nested-type aggregation, made deterministic: collect_list is
    * assembly-order-dependent (useless for reproducible output at any
    * scale); sort_array(collect_set(...)) pins it. Per nation: the
    * sorted distinct set of customer market segments. Output is
    * scalarized with array_join — the driver's comparator (and any
    * downstream consumer expecting hashable cells) can't sort
    * array-typed columns. */
  def collectSorted(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
        count(lit(1)).as("n_customers"))
      .orderBy("nationkey")

  val collectSortedSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |       array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
      |       count(*) AS n_customers
      |FROM customer GROUP BY 1 ORDER BY nationkey""".stripMargin

  /** UNPIVOT (wide → long): the per-returnflag decimal totals melted
    * into (flag, metric, value) rows via stack(). */
  def unpivotTotals(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("price"),
        sum(col("l_discount").cast(DecimalType(18, 2))).cast("double").as("discount"))
      .select(col("l_returnflag"),
        expr("stack(3, 'qty', qty, 'price', price, 'discount', discount) AS (metric, value)"))
      .orderBy("l_returnflag", "metric")

  val unpivotTotalsSql: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
      |         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS discount
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, metric, value FROM (
      |  SELECT l_returnflag, 'qty' AS metric, qty AS value FROM wide
      |  UNION ALL SELECT l_returnflag, 'price', price FROM wide
      |  UNION ALL SELECT l_returnflag, 'discount', discount FROM wide
      |)
      |ORDER BY l_returnflag, metric""".stripMargin

  /** LATERAL correlated derived table: for each region, the top-2
    * nations by name (a per-row dependent subquery with ORDER BY/LIMIT
    * — the general form of top-N-per-group when the inner query is
    * richer than a window can express). */
  def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "region").createOrReplaceTempView("v_r5_region")
    t(spark, dir, "nation").createOrReplaceTempView("v_r5_nation")
    spark.sql(
      """SELECT r.r_name, t.n_name
        |FROM v_r5_region r,
        |LATERAL (SELECT n_name FROM v_r5_nation n
        |         WHERE n.n_regionkey = r.r_regionkey
        |         ORDER BY n_name LIMIT 2) t
        |ORDER BY r_name, n_name""".stripMargin)
  }

  val lateralTopNSql: String =
    """SELECT r.r_name, t.n_name
      |FROM region r,
      |LATERAL (SELECT n_name FROM nation n
      |         WHERE n.n_regionkey = r.r_regionkey
      |         ORDER BY n_name LIMIT 2) t
      |ORDER BY r_name, n_name""".stripMargin

  /** Data-quality constraint report — the Deequ/dbt-test validation
    * pass every production pipeline runs before publishing a table:
    * uniqueness, not-null, referential integrity, range, and
    * accepted-values checks, each one aggregate (or anti-join count),
    * unioned into a (check_name, table, n_violations, n_checked) summary.
    * Scale: each check is a partial+final count or a key anti-join —
    * the checks share scans per table and nothing is driver-side; the
    * report is as wide as the check list, not the data. */
  def dqConstraintReport(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val orders = t(spark, dir, "orders")
    def row(check: String, table: String, violations: Column, checked: Column,
            src: DataFrame): DataFrame =
      src.agg(violations.as("n_violations"), checked.as("n_checked"))
        .select(lit(check).as("check_name"), lit(table).as("table_name"),
          col("n_violations").cast("long").as("n_violations"),
          col("n_checked").cast("long").as("n_checked"))
    val unique = orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") > 1, col("c") - 1)).as("v"), count(lit(1)).as("n"))
      .select(lit("unique_orderkey").as("check_name"), lit("orders").as("table_name"),
        coalesce(col("v"), lit(0L)).cast("long").as("n_violations"),
        col("n").cast("long").as("n_checked"))
    val notNull = row("not_null_shipdate", "lineitem",
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)), count(lit(1)), li)
    val refInt = row("ref_lineitem_orders", "lineitem",
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)), count(lit(1)),
      li.select("l_orderkey")
        .join(orders.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left"))
    val range = row("range_discount_0_1", "lineitem",
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)),
      count(lit(1)), li)
    val accepted = row("accepted_returnflag", "lineitem",
      sum(when(not(col("l_returnflag").isin("A", "N", "R")), 1L).otherwise(0L)),
      count(lit(1)), li)
    unique.unionAll(notNull).unionAll(refInt).unionAll(range).unionAll(accepted)
      .orderBy("check_name")
  }

  val dqConstraintReportSql: String =
    """SELECT * FROM (
      |  SELECT 'unique_orderkey' AS check_name, 'orders' AS table_name,
      |         CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT) AS n_violations,
      |         count(*) AS n_checked
      |  FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
      |  UNION ALL
      |  SELECT 'not_null_shipdate', 'lineitem',
      |         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(*)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'ref_lineitem_orders', 'lineitem',
      |         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(*)
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'range_discount_0_1', 'lineitem',
      |         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |         count(*)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'accepted_returnflag', 'lineitem',
      |         CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT),
      |         count(*)
      |  FROM lineitem
      |) ORDER BY check_name""".stripMargin

  /** ANALYZE-style column profile of lineitem — the statistics a
    * cost-based optimizer collects: exact NDV, null count, and min/max
    * per column, a row per column. Timestamps profile as epoch-µs
    * (exact integers below 2^53, so the DOUBLE min/max are identical
    * in both engines); string columns carry min/max in the string
    * slots.
    *
    * Plan: one independent single-COLUMN aggregate per profiled column,
    * unioned — each branch's parquet scan prunes to just its column
    * (ReadSchema is 1 field) and the branches run as parallel stages.
    * This beats the tempting single-pass form (11 DISTINCT aggregates
    * in one agg ⇒ Expand ×11 of the full-width row before the shuffle
    * — measured 25 s vs 2 s at sf0.1). A production ANALYZE at 100 TB
    * that wants one pass swaps exact NDV for the mergeable HLL
    * registers already on the board (`agg_hll_*`); kept exact here so
    * the oracle is exact. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val strCols = Seq("l_returnflag", "l_linestatus")
    // lineitem's shipdate is µs TIMESTAMP_NTZ (unlike events.ts nanos);
    // profile it as epoch-µs via the UTC session zone
    val li = t(spark, dir, "lineitem")
      .withColumn("l_shipdate_us", unix_micros(col("l_shipdate").cast("timestamp")))
    def branch(c: String, isStr: Boolean): DataFrame = {
      val base = li.select(col(c)).agg(
        countDistinct(col(c)).as("ndv"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("nn"),
        min(col(c)).as("mn"), max(col(c)).as("mx"))
      if (isStr)
        base.select(lit(c).as("column_name"), col("ndv").cast("long").as("ndv"),
          col("nn").cast("long").as("n_null"),
          lit(null).cast("double").as("min_num"), lit(null).cast("double").as("max_num"),
          col("mn").as("min_str"), col("mx").as("max_str"))
      else
        base.select(lit(c).as("column_name"), col("ndv").cast("long").as("ndv"),
          col("nn").cast("long").as("n_null"),
          col("mn").cast("double").as("min_num"), col("mx").cast("double").as("max_num"),
          lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
    }
    ((numCols :+ "l_shipdate_us").map(branch(_, isStr = false)) ++
      strCols.map(branch(_, isStr = true)))
      .reduce(_ unionAll _).orderBy("column_name")
  }

  val columnProfileSql: String = {
    val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val arms = numCols.map { c =>
      s"""SELECT '$c' AS column_name, count(DISTINCT $c)::BIGINT AS ndv,
         |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |       CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
         |       NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str FROM lineitem""".stripMargin
    } ++ Seq(
      """SELECT 'l_shipdate_us', count(DISTINCT l_shipdate)::BIGINT,
        |       CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(min(epoch_us(l_shipdate)) AS DOUBLE), CAST(max(epoch_us(l_shipdate)) AS DOUBLE),
        |       NULL::VARCHAR, NULL::VARCHAR FROM lineitem""".stripMargin) ++
      Seq("l_returnflag", "l_linestatus").map { c =>
        s"""SELECT '$c', count(DISTINCT $c)::BIGINT,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |       NULL::DOUBLE, NULL::DOUBLE, min($c), max($c) FROM lineitem""".stripMargin
      }
    s"""SELECT * FROM (
       |${arms.mkString("\nUNION ALL\n")}
       |) ORDER BY column_name""".stripMargin
  }

  /** Distribution-drift report — the data-quality check a pipeline runs
    * before trusting a new ingest batch: split events at the corpus
    * mid-time into a reference half and a current half, histogram
    * `value` per event type into 20 fixed bins, and report the total
    * variation distance between the two normalized histograms in
    * permille (0 = identical shape, 1000 = disjoint; defined as 1000
    * when one half has no rows of the type).
    *
    * Exactness: values quantize to 1e-4 BIGINT (the z-score idiom) and
    * bin by integer division, clamped to [0, 19] — the lower clamp also
    * removes the negative-dividend case where Spark's truncating `div`
    * and DuckDB's flooring `//` disagree (every negative value lands in
    * bin 0 in both engines). TV is computed on the EXACT rational
    * Σ|r·C − c·R| before a single non-negative integer division — no
    * float accumulates anywhere, so the oracle hash-matches.
    *
    * Scale: the exact rational needs 500·Σ|r·C − c·R| ≤ 1000·n_ref·
    * n_cur < 2⁶³, so it holds to 95 M rows PER SIDE PER TYPE. Beyond
    * that threshold the report switches (per type, per row — CaseWhen
    * branches evaluate lazily, so the exact products are never computed
    * where they would overflow ANSI arithmetic) to the PRE-NORMALIZED
    * path: each side's bin counts integer-rescale to a fixed 1e6 grid
    * (k = max(1, total div 1e6); bins divide by their own side's k;
    * totals recompute from the reduced bins so each side still sums to
    * its own denominator), and the same rational form runs on the
    * reduced numbers — products now bounded by (1e6)², safe to any
    * corpus size. The rescale floors each bin to its side's 1e-6
    * resolution, so the result can differ from true TV by at most
    * 20 bins · 1e-6 ≈ 0.02 permille — at most ±1 on the reported
    * integer. Both branches are pure integer ops mirrored in the
    * oracle; DriftNormalizationSpec pins the >bound path on synthetic
    * 2e8-row-per-side cells. Oracle-side caveat: DuckDB's CASE sits
    * OUTSIDE the aggregates (SQL evaluates both sum arms), so beyond
    * ~3e9 rows/side the exact arm's r·n products overflow and the
    * ORACLE errors even though the engine answers via the normalized
    * arm — at such sizes validate against the normalized SQL form
    * directly; the engine-side guard is lazy and unaffected.
    *
    * Shape: one 1-row broadcast (mid-time), one (type, bin) partial+
    * final count over a single scan, then type-cardinality joins —
    * histogram state is 20·|types| cells regardless of corpus size. */
  def dqDriftReport(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type"), col("ts"),
        floor(col("value").cast("double") * 10000d + 0.5d).cast("long").as("vq"))
    val mid = ev.agg(expr("(min(ts) + max(ts)) div 2").as("mid_ts"))
    val cells = ev.crossJoin(broadcast(mid))
      .select(col("event_type"),
        (col("ts") <= col("mid_ts")).cast("long").as("is_ref"),
        greatest(lit(0L), least(lit(19L), expr("vq div 300000"))).as("bin"))
      .groupBy("event_type", "bin")
      .agg(sum(col("is_ref")).as("r"), sum(lit(1L) - col("is_ref")).as("c"))
    dqDriftFromCells(cells)
  }

  /** Exact-below-bound / pre-normalized-above-bound TV report over a
    * (event_type, bin, r, c) cell frame — see [[dqDriftReport]].
    * Package-visible so DriftNormalizationSpec can feed synthetic cells
    * whose totals exceed the exact path's 95 M-per-side bound. */
  private[graft] def dqDriftFromCells(cells: DataFrame): DataFrame = {
    // 95e6² · 1000 = 9.03e18 < 2⁶³−1 = 9.22e18: the largest per-side
    // total where 500·Σ|r·C − c·R| provably fits a BIGINT
    val exactMax = 95000000L
    val totals = cells.groupBy("event_type")
      .agg(sum("r").as("n_ref"), sum("c").as("n_cur"))
    val reduced = cells.join(totals, "event_type")
      .withColumn("kr", greatest(lit(1L), expr("n_ref div 1000000")))
      .withColumn("kc", greatest(lit(1L), expr("n_cur div 1000000")))
      .withColumn("rs", expr("r div kr"))
      .withColumn("cs", expr("c div kc"))
    val reducedTotals = reduced.groupBy(col("event_type").as("event_type"))
      .agg(sum("rs").as("ns_ref"), sum("cs").as("ns_cur"))
    val within = col("n_ref") <= lit(exactMax) && col("n_cur") <= lit(exactMax)
    reduced.join(reducedTotals, "event_type")
      .groupBy(col("event_type"), col("n_ref"), col("n_cur"),
        col("ns_ref"), col("ns_cur"))
      .agg(
        sum(when(within, abs(col("r") * col("n_cur") - col("c") * col("n_ref"))))
          .as("num"),
        sum(abs(col("rs") * col("ns_cur") - col("cs") * col("ns_ref")))
          .as("num_s"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        when(col("n_ref") === 0L || col("n_cur") === 0L, lit(1000L))
          .when(within, expr("(500 * num) div (n_ref * n_cur)"))
          .otherwise(expr("(500 * num_s) div (ns_ref * ns_cur)"))
          .as("tv_permille"))
      .orderBy("event_type")
  }

  val dqDriftReportSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) AS tns,
      |         CAST(floor(CAST(value AS DOUBLE)*10000 + 0.5) AS BIGINT) AS vq
      |  FROM events
      |), mid AS (
      |  SELECT (min(tns) + max(tns)) // 2 AS mid_ts FROM ev
      |), cells AS (
      |  SELECT event_type,
      |         greatest(0, least(19, vq // 300000)) AS bin,
      |         CAST(sum(CASE WHEN tns <= mid_ts THEN 1 ELSE 0 END) AS BIGINT) AS r,
      |         CAST(sum(CASE WHEN tns <= mid_ts THEN 0 ELSE 1 END) AS BIGINT) AS c
      |  FROM ev, mid GROUP BY 1, 2
      |), totals AS (
      |  SELECT event_type, CAST(sum(r) AS BIGINT) AS n_ref,
      |         CAST(sum(c) AS BIGINT) AS n_cur
      |  FROM cells GROUP BY 1
      |), reduced AS (
      |  -- pre-normalized mirror (see dqDriftFromCells): each side's bins
      |  -- rescaled to a fixed 1e6 grid; a no-op (k=1) below 1e6 rows
      |  SELECT cl.event_type, cl.r, cl.c,
      |         cl.r // greatest(1, t.n_ref // 1000000) AS rs,
      |         cl.c // greatest(1, t.n_cur // 1000000) AS cs,
      |         t.n_ref, t.n_cur
      |  FROM cells cl JOIN totals t USING (event_type)
      |), rtotals AS (
      |  SELECT event_type, CAST(sum(rs) AS BIGINT) AS ns_ref,
      |         CAST(sum(cs) AS BIGINT) AS ns_cur
      |  FROM reduced GROUP BY 1
      |)
      |SELECT rd.event_type, rd.n_ref, rd.n_cur,
      |       CAST(CASE WHEN rd.n_ref = 0 OR rd.n_cur = 0 THEN 1000
      |            WHEN rd.n_ref <= 95000000 AND rd.n_cur <= 95000000
      |              THEN (500 * sum(abs(rd.r * rd.n_cur - rd.c * rd.n_ref)))
      |                   // (rd.n_ref * rd.n_cur)
      |            ELSE (500 * sum(abs(rd.rs * rt.ns_cur - rd.cs * rt.ns_ref)))
      |                 // (rt.ns_ref * rt.ns_cur)
      |       END AS BIGINT) AS tv_permille
      |FROM reduced rd JOIN rtotals rt USING (event_type)
      |GROUP BY rd.event_type, rd.n_ref, rd.n_cur, rt.ns_ref, rt.ns_cur
      |ORDER BY rd.event_type""".stripMargin

  /** Data-freshness report — the ingestion-health dashboard every
    * multi-feed pipeline runs before trusting "latest" data: per feed
    * (event_type stands in for the source feed), event count, last-seen
    * event time, staleness against the globally freshest feed, and a
    * thresholded status. Pure integer second arithmetic (identical in
    * the oracle); shapes: one per-feed partial+final agg + a 1-row
    * broadcast global max — feed cardinality output, never event-scaled. */
  def dqFreshnessReport(spark: SparkSession, dir: String): DataFrame = {
    val perFeed = graft.operators.Tables.t(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        max(expr("ts div 1000000000")).as("last_seen_s"))
    val global = perFeed.agg(max("last_seen_s").as("global_last_s"))
    perFeed.crossJoin(broadcast(global))
      .withColumn("staleness_s", col("global_last_s") - col("last_seen_s"))
      .withColumn("status",
        when(col("staleness_s") < 3600L, "fresh")
          .when(col("staleness_s") < 86400L, "lagging")
          .otherwise("stale"))
      .select("event_type", "n_events", "last_seen_s", "staleness_s", "status")
      .orderBy("event_type")
  }

  val dqFreshnessReportSql: String =
    """WITH perfeed AS (
      |  SELECT event_type, count(*) AS n_events,
      |         max(epoch_ns(ts) // 1000000000) AS last_seen_s
      |  FROM events GROUP BY 1
      |), g AS (SELECT max(last_seen_s) AS global_last_s FROM perfeed)
      |SELECT event_type, n_events, last_seen_s,
      |       g.global_last_s - last_seen_s AS staleness_s,
      |       CASE WHEN g.global_last_s - last_seen_s < 3600 THEN 'fresh'
      |            WHEN g.global_last_s - last_seen_s < 86400 THEN 'lagging'
      |            ELSE 'stale' END AS status
      |FROM perfeed, g ORDER BY event_type""".stripMargin

  /** Referential-integrity audit over the star schema's FK edges —
    * the cross-table companion of the per-table `dq_id_audit`: for
    * each declared child→parent relation, child rows, distinct child
    * keys, NULL keys, and ORPHAN rows (child keys with no parent).
    * The first audit run when a partial backfill or an out-of-order
    * ingest is suspected; on clean TPC-H-shaped data every orphan
    * count is 0, which is exactly what the gate proves.
    *
    * Scale shape: one left-anti join per FK edge on the key the child
    * would shuffle on anyway; parent key sets project to a single
    * column (pruned scan) and broadcast when dimension-sized. The
    * report is edge-cardinality rows. */
  def dqRefIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Tables.t
    def audit(edge: String, childTable: String, childKey: String,
              parentTable: String, parentKey: String): DataFrame = {
      val child = t(spark, dir, childTable).select(col(childKey).as("k"))
      val parent = t(spark, dir, parentTable).select(col(parentKey).as("k")).distinct()
      val stats = child.agg(count(lit(1)).as("n_rows"),
        countDistinct(col("k")).as("n_keys"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"))
      val orphans = child.filter(col("k").isNotNull)
        .join(parent, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      stats.crossJoin(broadcast(orphans))
        .select(lit(edge).as("fk_edge"), col("n_rows"), col("n_keys"),
          col("n_null"), col("n_orphans"))
    }
    Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .map { case (e, ct, ck, pt, pk) => audit(e, ct, ck, pt, pk) }
      .reduce(_ unionAll _)
      .orderBy("fk_edge")
  }

  val dqRefIntegritySql: String = {
    val edges = Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
    edges.map { case (e, ct, ck, pt, pk) =>
      s"""SELECT '$e' AS fk_edge, count(*) AS n_rows,
         |       CAST(count(DISTINCT $ck) AS BIGINT) AS n_keys,
         |       CAST(sum(CASE WHEN $ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |       (SELECT count(*) FROM $ct c
         |        WHERE c.$ck IS NOT NULL
         |          AND NOT EXISTS (SELECT 1 FROM $pt p WHERE p.$pk = c.$ck))
         |         AS n_orphans
         |FROM $ct""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY fk_edge"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_ref_integrity" -> dqRefIntegrity,
    "dq_freshness_report" -> dqFreshnessReport,
    "dq_drift_report" -> dqDriftReport,
    "sub_exists" -> existsSubquery,
    "set_ops_intersect" -> setIntersect,
    "agg_collect_sorted" -> collectSorted,
    "agg_unpivot" -> unpivotTotals,
    "dq_constraint_report" -> dqConstraintReport,
    "stat_column_profile" -> columnProfile,
    "join_lateral_topn" -> lateralTopN)

  val oracles: Map[String, String] = Map(
    "dq_ref_integrity" -> dqRefIntegritySql,
    "dq_freshness_report" -> dqFreshnessReportSql,
    "dq_drift_report" -> dqDriftReportSql,
    "sub_exists" -> existsSubquerySql,
    "set_ops_intersect" -> setIntersectSql,
    "agg_collect_sorted" -> collectSortedSql,
    "agg_unpivot" -> unpivotTotalsSql,
    "dq_constraint_report" -> dqConstraintReportSql,
    "stat_column_profile" -> columnProfileSql,
    "join_lateral_topn" -> lateralTopNSql)
}
