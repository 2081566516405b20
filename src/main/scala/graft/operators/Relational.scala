package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's operator inventory (SURVEY.md §2) re-expressed as
  * user-facing relational queries over the harness tables, plus the
  * relational surface (joins/aggregates/windows/set ops) that the
  * reference's phases use as implementation idiom.
  *
  * Oracle-comparability rules used throughout (SURVEY.md §7.4.5):
  *  - money math in DECIMAL (exact, order/partitioning-independent),
  *    cast to DOUBLE only at the very end — both engines then emit the
  *    identical nearest-double of the same exact decimal;
  *  - every query ends in a total order with a unique tie-break key;
  *  - no raw timestamp outputs (parquet ns vs µs truncation differs).
  *
  * Scale notes are per-query: these run on single parquet files locally
  * but are written for a partitioned 100 TB layout — filters and
  * projections sit directly on the scan (pushdown), dimension joins
  * broadcast, aggregations are partial+final on the group keys.
  */
object Relational {
  import Tables.t

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** S2/S3 point lookup: key-restricted scan + projection. On a cluster
    * this prunes to one partition via parquet min/max + pushed filter
    * (reference: hash-probe `HashTable::contain`,
    * /root/reference/src/cuda/hashTable.cuh:94-110). */
  def pointLookup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_orderkey") === 42)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
      .orderBy("l_linenumber")

  val pointLookupSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
      |FROM lineitem WHERE l_orderkey = 42 ORDER BY l_linenumber""".stripMargin

  /** S11/S14 full scan + row count (reference `show_all_table` /
    * `get_size`). count(*) is a partial+final agg — no data movement
    * beyond one long per partition. */
  def fullScanCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  val fullScanCountSql: String = "SELECT count(*) AS cnt FROM lineitem"

  /** S14 across the catalog: one row per table (union of local aggs). */
  def tableSizes(spark: SparkSession, dir: String): DataFrame =
    Seq("lineitem", "orders", "customer")
      .map(n => t(spark, dir, n).agg(count(lit(1)).as("cnt")).select(lit(n).as("tbl"), col("cnt")))
      .reduce(_ unionAll _)
      .orderBy("tbl")

  val tableSizesSql: String =
    """SELECT * FROM (
      |  SELECT 'lineitem' AS tbl, count(*) AS cnt FROM lineitem
      |  UNION ALL SELECT 'orders', count(*) FROM orders
      |  UNION ALL SELECT 'customer', count(*) FROM customer
      |) ORDER BY tbl""".stripMargin

  /** T2 Execute: batch point lookups ≡ equi hash join (SURVEY.md §2 T2).
    * orders is the "transaction batch", lineitem the "table"; Catalyst
    * picks broadcast vs shuffled-hash vs sort-merge by size (AQE). */
  def batchLookupJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_totalprice") > 250000.0)
      .select("o_orderkey", "o_custkey")
      .join(t(spark, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_custkey", "l_linenumber", "l_extendedprice")
      .orderBy("o_orderkey", "l_linenumber")

  val batchLookupJoinSql: String =
    """SELECT o_orderkey, o_custkey, l_linenumber, l_extendedprice
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_totalprice > 250000.0
      |ORDER BY o_orderkey, l_linenumber""".stripMargin

  /** T5 Reserve: per-key min-Tid reservations as a grouped min — the
    * CAS-min race of the reference (metadatahelper.cuh:36-90) is a
    * commutative monoid → partial+final hash agg, one shuffle on key. */
  def reserveMinAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("key"))
      .agg(
        min("l_orderkey").as("rts"),
        coalesce(min(when(col("l_returnflag") === "R", col("l_orderkey"))), lit(0L)).as("wts"))
      .orderBy("key")

  val reserveMinAggSql: String =
    """SELECT l_partkey AS key, min(l_orderkey) AS rts,
      |       coalesce(min(CASE WHEN l_returnflag = 'R' THEN l_orderkey END), 0) AS wts
      |FROM lineitem GROUP BY l_partkey ORDER BY key""".stripMargin

  /** T6 Commit hazard analysis: ops ⋈ reservations + per-txn bool-or of
    * hazard flags (strictly-smaller-Tid rule, TrancM_func.cuh:126-164).
    * Here tid = l_orderkey, key = l_partkey, write ≡ returnflag 'R'. */
  def hazardFlags(spark: SparkSession, dir: String): DataFrame = {
    val ops = t(spark, dir, "lineitem").select(
      col("l_orderkey").as("tid"), col("l_partkey").as("key"),
      (col("l_returnflag") === "R").as("is_update"))
    val res = ops.groupBy("key").agg(
      min("tid").as("rts"),
      coalesce(min(when(col("is_update"), col("tid"))), lit(0L)).as("wts"))
    ops.join(res, "key")
      .groupBy("tid")
      .agg(
        max(col("wts") =!= 0 && col("wts") < col("tid")).as("raw"),
        max(col("is_update") && col("rts") < col("tid")).as("war"),
        max(col("is_update") && col("wts") =!= 0 && col("wts") < col("tid")).as("waw"))
      .orderBy("tid")
  }

  val hazardFlagsSql: String =
    """WITH ops AS (
      |  SELECT l_orderkey AS tid, l_partkey AS key,
      |         l_returnflag = 'R' AS is_update
      |  FROM lineitem
      |), res AS (
      |  SELECT key, min(tid) AS rts,
      |         coalesce(min(CASE WHEN is_update THEN tid END), 0) AS wts
      |  FROM ops GROUP BY key
      |)
      |SELECT tid,
      |       bool_or(wts <> 0 AND wts < tid) AS raw,
      |       bool_or(is_update AND rts < tid) AS war,
      |       bool_or(is_update AND wts <> 0 AND wts < tid) AS waw
      |FROM ops JOIN res USING (key)
      |GROUP BY tid ORDER BY tid""".stripMargin

  /** T7 Install: last-writer-wins merge back into a base table. Winner
    * per key = max (orderkey, linenumber) — a commutative max(struct)
    * agg (one shuffle), then a left-join + coalesce merge; the winner
    * side is small → AQE broadcasts it. */
  def installMerge(spark: SparkSession, dir: String): DataFrame = {
    val winners = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(max(struct(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))).as("w"))
      .select(col("p_partkey"), col("w.l_extendedprice").as("new_price"))
    t(spark, dir, "part")
      .join(winners, Seq("p_partkey"), "left")
      .select(col("p_partkey"),
        coalesce(col("new_price"), col("p_retailprice")).as("price"))
      .orderBy("p_partkey")
  }

  val installMergeSql: String =
    """WITH ranked AS (
      |  SELECT l_partkey AS p_partkey, l_extendedprice AS new_price,
      |         row_number() OVER (PARTITION BY l_partkey
      |                            ORDER BY l_orderkey DESC, l_linenumber DESC) AS rn
      |  FROM lineitem
      |)
      |SELECT p.p_partkey, coalesce(w.new_price, p.p_retailprice) AS price
      |FROM part p LEFT JOIN (SELECT p_partkey, new_price FROM ranked WHERE rn = 1) w
      |  USING (p_partkey)
      |ORDER BY p_partkey""".stripMargin

  /** T8 Collect: filter the "aborted" subset + dense renumber 1..m in
    * original order (TransctionManager.cuh:176-184). In the engine this
    * runs on the tiny retry set (driver-broadcast mapping, Aria.collect);
    * here — on an unbounded input — the dense index is a two-phase
    * renumber: range-partition + local sort (globally sorted, parallel),
    * then per-partition counts → cumulative offsets → partition-local
    * index (`zipWithIndex`). No global single-partition window. */
  def collectRenumber(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("tid"))
      .repartitionByRange(col("tid"))
      .sortWithinPartitions("tid")
      .as[Long].rdd.zipWithIndex()
      .map { case (tid, i) => (tid, i + 1L) }
      .toDF("tid", "new_tid")
      .orderBy("tid")
  }

  val collectRenumberSql: String =
    """SELECT o_orderkey AS tid,
      |       row_number() OVER (ORDER BY o_orderkey) AS new_tid
      |FROM orders WHERE o_orderstatus = 'F' ORDER BY tid""".stripMargin

  /** T10 per-key op chains: same-key ops ordered, distinct keys parallel
    * (key_op_chain.cuh:72-189) ≡ a partitioned, ordered window. */
  def opChainSeq(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id")).cast("long").as("seq"))
      .orderBy("user_id", "seq")

  val opChainSeqSql: String =
    """SELECT user_id, event_id,
      |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
      |FROM events ORDER BY user_id, seq""".stripMargin

  // ——— Relational surface beyond the reference (harness-graded) ———

  /** TPC-H Q1-style pricing summary: wide partial+final aggregation.
    * DECIMAL sums (exact) cast to DOUBLE at the end. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: 3-way join + grouped revenue + top-k. The two
    * filters push to the scans; the final top-10 is a TakeOrdered (no
    * global sort shuffle). */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val revenue = dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount")))
    t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"))
      .join(t(spark, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT o_orderkey,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style: 5-way star join through two dimension chains.
    * region/nation/supplier broadcast; the fact-side join shuffles once
    * on the orderkey. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val revenue = dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount")))
    t(spark, dir, "region").filter(col("r_name") === "ASIA")
      .join(t(spark, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
      .join(t(spark, dir, "supplier"), col("n_nationkey") === col("s_nationkey"))
      .join(t(spark, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val localSupplierVolumeSql: String =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |            JOIN supplier ON n_nationkey = s_nationkey
      |            JOIN lineitem ON s_suppkey = l_suppkey
      |            JOIN orders ON l_orderkey = o_orderkey
      |            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Semi/anti joins: customers with vs without orders, tagged. Both
    * sides are broadcast-able existence joins (no row multiplication). */
  def semiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select("c_custkey")
    val o = t(spark, dir, "orders").select("o_custkey")
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("with_orders").as("tag"))
    val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("tag"))
    withOrders.unionAll(without).orderBy("c_custkey", "tag")
  }

  val semiAntiJoinSql: String =
    """SELECT * FROM (
      |  SELECT c_custkey, 'with_orders' AS tag FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, 'no_orders' AS tag FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |) ORDER BY c_custkey, tag""".stripMargin

  /** ROLLUP over the region→nation dimension chain: multi-level agg in
    * one pass (Spark expands grouping sets before the shuffle). */
  def rollupCustomers(spark: SparkSession, dir: String): DataFrame = {
    // Catalyst's ambiguous-self-join check misfires on rollup-after-join
    // grouping attributes when the result is sorted on them; the SQL path
    // resolves cleanly to the identical plan.
    t(spark, dir, "customer").createOrReplaceTempView("v_customer")
    t(spark, dir, "nation").createOrReplaceTempView("v_nation")
    t(spark, dir, "region").createOrReplaceTempView("v_region")
    spark.sql(
      """SELECT r_name AS region_name, n_name AS nation_name,
        |       count(*) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM v_customer JOIN v_nation ON c_nationkey = n_nationkey
        |                JOIN v_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (region_name, nation_name)
        |ORDER BY region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST""".stripMargin)
  }

  val rollupCustomersSql: String =
    """SELECT r_name AS region_name, n_name AS nation_name, count(*) AS n_customers,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (region_name, nation_name)
      |ORDER BY region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST""".stripMargin

  /** Set operations: UNION (distinct) then EXCEPT. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    val fOrders = t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey"))
    building.union(auto).distinct().except(fOrders).orderBy("c_custkey")
  }

  val setOpsSql: String =
    """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | UNION
      | SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY c_custkey""".stripMargin

  /** Top-k per group: rank window bounded to 3 — partitioned parallel,
    * no global sort. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(
          Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey")))
          .cast("long").as("rk"))
      .filter(col("rk") <= 3)
      .orderBy("o_custkey", "rk")

  val topkPerGroupSql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders
      |) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** Running aggregate window over the events stream table (DECIMAL,
    * then DOUBLE — exact prefix sums). */
  def runningSum(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        sum(col("value").cast(DecimalType(18, 4)))
          .over(Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_value"))
      .orderBy("user_id", "event_id")

  val runningSumSql: String =
    """SELECT user_id, event_id,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
      |         PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Sessionization: 30-minute-gap sessions per user via lag + running
    * count — the standard scalable pattern (two windows over the same
    * partitioning → one shuffle). Gap compare in exact integer ns. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(spark, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > 1800L * 1000000000L, 1).otherwise(0))
      .select(col("user_id"), col("event_id"),
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_id"))
      .orderBy("user_id", "event_id")
  }

  val sessionizeSql: String =
    """WITH gaps AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
      |         lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tns
      |  FROM events
      |)
      |SELECT user_id, event_id,
      |       CAST(sum(CASE WHEN prev_tns IS NULL OR tns - prev_tns > 1800000000000
      |                THEN 1 ELSE 0 END)
      |         OVER (PARTITION BY user_id ORDER BY tns, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |FROM gaps ORDER BY user_id, event_id""".stripMargin

  /** Tumbling-window aggregation over events (batch form of the
    * streaming windowed agg; see graft.streaming for the readStream
    * variant). Hour buckets as epoch-seconds (no raw timestamps out). */
  def tumblingAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy((expr("ts div 3600000000000") * 3600).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .orderBy("window_start", "event_type")

  val tumblingAggSql: String =
    """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Distinct + count-distinct aggregates. */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val distinctAggSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Scalar function surface: string/date/math built-ins (codegen'd;
    * the reference has no scalar library at all — SURVEY.md §2.4). */
  def scalarFunctions(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name_pfx"),
        length(col("p_type")).cast("long").as("type_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_size") % 7).as("size_mod"),
        abs(col("p_size") - 25).as("size_dist"))
      .orderBy("p_partkey")

  val scalarFunctionsSql: String =
    """SELECT p_partkey, upper(p_brand) AS brand_u,
      |       substr(p_name, 1, 8) AS name_pfx, length(p_type) AS type_len,
      |       concat_ws('|', p_brand, p_type) AS brand_type,
      |       p_size % 7 AS size_mod, abs(p_size - 25) AS size_dist
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time function surface over orders. */
  def dateFunctions(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  val dateFunctionsSql: String =
    """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
      |       day(o_orderdate) AS d, quarter(o_orderdate) AS q,
      |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** All queries + oracles exported to SparkEntry. */
  /** Pure-SQL call path through the V2 FunctionCatalog
    * ([[graft.plans.GraftFunctionCatalog]], registered lazily on the
    * runtime conf — catalogs instantiate on first reference): the
    * catalog-qualified `graftfn.ns.permille/clamp` resolve through the
    * V2 function-resolution path and bind their MAGIC methods inside
    * codegen. The query itself is the winsorize-and-share report those
    * primitives exist for. */
  def catalogV2Functions(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftfn",
      classOf[graft.plans.GraftFunctionCatalog].getName)
    t(spark, dir, "lineitem").createOrReplaceTempView("li_fncat")
    spark.sql(
      """WITH base AS (
        |  SELECT l_returnflag,
        |         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc
        |  FROM li_fncat
        |), agg AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         sum(graftfn.ns.clamp(qc, 1000L, 4000L)) AS clamped_qty
        |  FROM base GROUP BY l_returnflag
        |), tot AS (SELECT sum(n) AS nn FROM agg)
        |SELECT l_returnflag, n, clamped_qty,
        |       graftfn.ns.permille(n, nn) AS share_permille
        |FROM agg CROSS JOIN tot ORDER BY l_returnflag""".stripMargin)
  }

  val catalogV2FunctionsSql: String =
    """WITH base AS (
      |  SELECT l_returnflag,
      |         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc
      |  FROM lineitem
      |), agg AS (
      |  SELECT l_returnflag, count(*) AS n,
      |         CAST(sum(greatest(1000, least(4000, qc))) AS BIGINT) AS clamped_qty
      |  FROM base GROUP BY l_returnflag
      |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM agg)
      |SELECT l_returnflag, n, clamped_qty, (1000 * n) // nn AS share_permille
      |FROM agg CROSS JOIN tot ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s2_point_lookup" -> pointLookup,
    "s11_full_scan_count" -> fullScanCount,
    "s14_table_sizes" -> tableSizes,
    "t2_batch_lookup_join" -> batchLookupJoin,
    "t5_reserve_min_agg" -> reserveMinAgg,
    "t6_hazard_flags" -> hazardFlags,
    "t7_install_merge" -> installMerge,
    "t8_collect_renumber" -> collectRenumber,
    "t10_op_chain_seq" -> opChainSeq,
    "q1_pricing_summary" -> pricingSummary,
    "q3_shipping_priority" -> shippingPriority,
    "q5_local_supplier_volume" -> localSupplierVolume,
    "join_semi_anti" -> semiAntiJoin,
    "agg_rollup_customers" -> rollupCustomers,
    "set_ops_except" -> setOps,
    "window_topk_per_group" -> topkPerGroup,
    "window_running_sum" -> runningSum,
    "window_sessionize" -> sessionize,
    "agg_tumbling_events" -> tumblingAgg,
    "agg_distinct" -> distinctAgg,
    "fn_scalar_string_math" -> scalarFunctions,
    "fn_date_parts" -> dateFunctions,
    "fn_catalog_v2" -> catalogV2Functions)

  val oracles: Map[String, String] = Map(
    "s2_point_lookup" -> pointLookupSql,
    "s11_full_scan_count" -> fullScanCountSql,
    "s14_table_sizes" -> tableSizesSql,
    "t2_batch_lookup_join" -> batchLookupJoinSql,
    "t5_reserve_min_agg" -> reserveMinAggSql,
    "t6_hazard_flags" -> hazardFlagsSql,
    "t7_install_merge" -> installMergeSql,
    "t8_collect_renumber" -> collectRenumberSql,
    "t10_op_chain_seq" -> opChainSeqSql,
    "q1_pricing_summary" -> pricingSummarySql,
    "q3_shipping_priority" -> shippingPrioritySql,
    "q5_local_supplier_volume" -> localSupplierVolumeSql,
    "join_semi_anti" -> semiAntiJoinSql,
    "agg_rollup_customers" -> rollupCustomersSql,
    "set_ops_except" -> setOpsSql,
    "window_topk_per_group" -> topkPerGroupSql,
    "window_running_sum" -> runningSumSql,
    "window_sessionize" -> sessionizeSql,
    "agg_tumbling_events" -> tumblingAggSql,
    "agg_distinct" -> distinctAggSql,
    "fn_scalar_string_math" -> scalarFunctionsSql,
    "fn_date_parts" -> dateFunctionsSql,
    "fn_catalog_v2" -> catalogV2FunctionsSql)
}
