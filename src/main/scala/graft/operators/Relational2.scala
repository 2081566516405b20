package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second tranche of the relational surface: JSON access, ranking-window
  * family, CUBE, array functions, and the mutation operators the
  * reference only stubs (S5 incremental upsert, S12 delete, S13 update —
  * /root/reference/src/cuda/hashTable.cuh:112-114,
  * /root/reference/src/database/common/table.cuh:97-99): in a Spark
  * engine these are snapshot transforms — anti-join (delete), join+merge
  * (update), union+last-writer-wins (upsert) — each one shuffle on the
  * key, broadcastable when the delta is small.
  */
object Relational2 {
  import Tables.t

  /** JSON field access on the events props column (codegen'd path
    * expression, no UDF). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"))
      .orderBy("event_id")

  val jsonExtractSql: String =
    """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
      |FROM events ORDER BY event_id""".stripMargin

  /** The ranking-window family: rank, dense_rank, lag, lead, ntile over
    * one partitioning (single shuffle for all five). */
  def rankingWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        lag("o_orderkey", 1).over(w).as("prev_ok"),
        lead("o_orderkey", 1).over(w).as("next_ok"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("o_custkey", "rk", "o_orderkey")
  }

  val rankingWindowsSql: String =
    """SELECT o_custkey, o_orderkey,
      |       rank() OVER w AS rk,
      |       dense_rank() OVER w AS drk,
      |       lag(o_orderkey) OVER w AS prev_ok,
      |       lead(o_orderkey) OVER w AS next_ok,
      |       ntile(4) OVER w AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, rk, o_orderkey""".stripMargin

  /** The distribution-window family: percent_rank and cume_dist over
    * the same partitioning as the ranking family (one shuffle). Both
    * are ratios of identical integers — (rank−1)/(n−1) and
    * rows≤current/n — so the doubles agree bit-for-bit cross-engine. */
  def distributionWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val distributionWindowsSql: String =
    """SELECT o_custkey, o_orderkey,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cum_dist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** CUBE over (returnflag, linestatus) — all four grouping combinations
    * in one pass. fanOut: the 4× Expand + decimal partial agg is the
    * CPU-heavy part; see Tables.fanOut. */
  def cubePricing(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast(DecimalType(18, 2)).as("qty")))
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("qty").cast("double").as("sum_qty"))
      .transform(d => d.orderBy(d("l_returnflag").asc_nulls_first,
        d("l_linestatus").asc_nulls_first))

  val cubePricingSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Array-function surface over tokenized documents (slice, contains,
    * position, reverse; 1-based indexing in both engines). The sliced
    * prefix is emitted as a scalar (concat_ws) — the driver's pandas
    * comparator cannot sort/hash array-typed columns. */
  def arrayOps(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.text.TextAnalysis.tokens(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id"),
        concat_ws(" ", slice(toks, 1, 3)).as("first3"),
        array_contains(toks, "spark").as("has_spark"),
        array_position(toks, "data").cast("long").as("data_pos"),
        element_at(reverse(toks), 1).as("last_tok"))
      .orderBy("doc_id")
  }

  val arrayOpsSql: String =
    """WITH tk AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks
      |FROM documents)
      |SELECT doc_id, array_to_string(toks[1:3], ' ') AS first3,
      |       list_contains(toks, 'spark') AS has_spark,
      |       coalesce(list_position(toks, 'data'), 0)::BIGINT AS data_pos,
      |       toks[-1] AS last_tok
      |FROM tk ORDER BY doc_id""".stripMargin

  /** S12 Delete as a snapshot transform: remove parts never referenced
    * by lineitem (left-anti join; the delete set side is an existence
    * probe, broadcast when small). */
  def deleteAntiJoin(spark: SparkSession, dir: String): DataFrame =
    // retention delete: parts with NO shipment since 2001 (the plain
    // no-reference form is vacuous on this dataset — every part has
    // some lineitem; the date-pruned probe keeps the anti-join
    // non-degenerate at every sf and pushes the filter into the scan)
    t(spark, dir, "part")
      .join(t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("l_partkey")),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy("p_partkey")

  val deleteAntiJoinSql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey
      |                    AND l_shipdate >= TIMESTAMP '2001-01-01')
      |ORDER BY p_partkey""".stripMargin

  /** S13 Update as join + merge: +10% retail price for parts with any
    * returned ('R') lineitem; untouched rows pass through (coalesce). */
  def updateMerge(spark: SparkSession, dir: String): DataFrame = {
    val returned = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_partkey").as("p_partkey")).distinct()
      .withColumn("bump", lit(true))
    t(spark, dir, "part")
      .join(returned, Seq("p_partkey"), "left")
      .select(col("p_partkey"),
        when(col("bump"),
          (col("p_retailprice").cast(DecimalType(18, 2)) * lit(1.1).cast(DecimalType(3, 1)))
            .cast("double"))
          .otherwise(col("p_retailprice")).as("price"),
        coalesce(col("bump"), lit(false)).as("updated"))
      .orderBy("p_partkey")
  }

  val updateMergeSql: String =
    """WITH returned AS (
      |  SELECT DISTINCT l_partkey AS p_partkey, true AS bump
      |  FROM lineitem WHERE l_returnflag = 'R'
      |)
      |SELECT p.p_partkey,
      |       CASE WHEN r.bump THEN CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)) AS DOUBLE)
      |            ELSE p_retailprice END AS price,
      |       coalesce(r.bump, false) AS updated
      |FROM part p LEFT JOIN returned r USING (p_partkey)
      |ORDER BY p_partkey""".stripMargin

  /** S5 incremental upsert: a delta of modified customers unioned with
    * the base, conflict resolved last-writer-wins by source priority
    * (union + per-key max(struct) — one shuffle, commutative agg, no
    * window). */
  def upsertUnion(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), lit(0).as("src"))
    val delta = t(spark, dir, "customer")
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), lit("UPSERTED").as("c_mktsegment"), lit(1).as("src"))
    base.unionAll(delta)
      .groupBy("c_custkey")
      .agg(max(struct(col("src"), col("c_mktsegment"))).as("w"))
      .select(col("c_custkey"), col("w.c_mktsegment").as("mktsegment"),
        (col("w.src") === 1).as("was_upserted"))
      .orderBy("c_custkey")
  }

  val upsertUnionSql: String =
    """WITH u AS (
      |  SELECT c_custkey, c_mktsegment, 0 AS src FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'UPSERTED', 1 FROM customer WHERE c_custkey % 10 = 0
      |), ranked AS (
      |  SELECT c_custkey, c_mktsegment, src,
      |         row_number() OVER (PARTITION BY c_custkey ORDER BY src DESC) AS rn
      |  FROM u
      |)
      |SELECT c_custkey, c_mktsegment AS mktsegment, src = 1 AS was_upserted
      |FROM ranked WHERE rn = 1 ORDER BY c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_json_extract" -> jsonExtract,
    "window_ranking_family" -> rankingWindows,
    "window_distribution_family" -> distributionWindows,
    "agg_cube_pricing" -> cubePricing,
    "fn_array_ops" -> arrayOps,
    "s12_delete_antijoin" -> deleteAntiJoin,
    "s13_update_merge" -> updateMerge,
    "s5_upsert_union" -> upsertUnion)

  val oracles: Map[String, String] = Map(
    "fn_json_extract" -> jsonExtractSql,
    "window_ranking_family" -> rankingWindowsSql,
    "window_distribution_family" -> distributionWindowsSql,
    "agg_cube_pricing" -> cubePricingSql,
    "fn_array_ops" -> arrayOpsSql,
    "s12_delete_antijoin" -> deleteAntiJoinSql,
    "s13_update_merge" -> updateMergeSql,
    "s5_upsert_union" -> upsertUnionSql)
}
