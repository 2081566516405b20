package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fourth tranche: outer joins with NULL semantics, salted skewed join,
  * and per-session aggregation (sessionize → group).
  */
object Relational4 {
  import Tables.t

  /** Full outer join with match indicators — NULL semantics of outer
    * joins surfaced explicitly (every customer × order pairing state). */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val o = t(spark, dir, "orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_mktsegment").isNotNull.as("has_customer"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("custkey")
  }

  val fullOuterJoinSql: String =
    """SELECT coalesce(c_custkey, o_custkey) AS custkey,
      |       c_mktsegment IS NOT NULL AS has_customer,
      |       coalesce(n_orders, 0) AS n_orders
      |FROM customer
      |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
      |                 FROM orders GROUP BY o_custkey) o
      |  ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  /** Salted skewed join: the fact side's join key has 3 values (extreme
    * skew). Replicate the small side SALT× and scatter the fact side —
    * each (key, salt) cell is 1/SALT of the hot key. The oracle is the
    * PLAIN join: salting must be invisible in the result. (AQE's
    * skew-join does this at runtime for sort-merge; the explicit pattern
    * is for when you need it deterministic or pre-shuffled.) */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val salt = 8
    val dim = Seq(("A", "returned"), ("N", "kept"), ("R", "refunded"))
    val dimDf = spark.createDataFrame(dim).toDF("flag", "label")
      .crossJoin(spark.range(salt).select(col("id").cast("int").as("salt")))
    val fact = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salt.toLong))
          .cast("int").as("salt"))
    fact.join(dimDf,
        fact("l_returnflag") === dimDf("flag") && fact("salt") === dimDf("salt"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"))
      .orderBy("label")
  }

  val saltedJoinSql: String =
    """SELECT CASE l_returnflag WHEN 'A' THEN 'returned'
      |                         WHEN 'N' THEN 'kept'
      |                         WHEN 'R' THEN 'refunded' END AS label,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_returnflag IN ('A', 'N', 'R')
      |GROUP BY 1 ORDER BY label""".stripMargin

  /** Per-session aggregation: sessionize (30-min gaps) then aggregate
    * each (user, session): event count, value sum, duration. The
    * composition training pipelines actually run (the sessionize window
    * and the group share the user_id partitioning — one shuffle). */
  def sessionAgg(spark: SparkSession, dir: String): DataFrame = {
    // µs throughout on BOTH engines: DuckDB reads ns-parquet timestamps
    // µs-truncated, so ns-side math risks off-by-one at gap boundaries
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    t(spark, dir, "events")
      .withColumn("tus", expr("ts div 1000"))
      .withColumn("prev_tus", lag("tus", 1).over(w))
      .withColumn("new_session",
        when(col("prev_tus").isNull ||
          col("tus") - col("prev_tus") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"),
        (max("tus") - min("tus")).as("duration_us"))
      .orderBy("user_id", "session_id")
  }

  val sessionAggSql: String =
    """WITH gaps AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus, value,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_tus
      |  FROM events
      |), sess AS (
      |  SELECT user_id, event_id, value, tus,
      |         sum(CASE WHEN prev_tus IS NULL OR tus - prev_tus > 1800000000
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY tus, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM gaps
      |)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |       max(tus) - min(tus) AS duration_us
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** NOT IN three-valued-logic semantics — the null-aware anti join, a
    * different plan class from [[graft.operators.Relational]]'s
    * NOT-EXISTS left-anti (`join_semi_anti`): one NULL in the subquery
    * list makes every NOT IN predicate UNKNOWN, so the result is EMPTY
    * rather than "everything". Three arms pin the full truth table:
    * IN (semi), NOT IN over a null-free list (anti, nonempty), and
    * NOT IN over a list containing NULLs (empty by SQL semantics —
    * the case a naive anti-join rewrite gets wrong). Spark plans the
    * NOT IN arms as null-aware anti joins (single-column NAAJ
    * broadcasts the build side; the probe streams — scale-safe as long
    * as the filtered subquery is dimension-sized, as here). */
  def nullAwareAnti(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("v_naaj_customer")
    t(spark, dir, "orders").createOrReplaceTempView("v_naaj_orders")
    spark.sql(
      """SELECT tag, n_customers FROM (
        |  SELECT 'has_big_order' AS tag, count(*) AS n_customers
        |  FROM v_naaj_customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM v_naaj_orders
        |                      WHERE o_totalprice > 300000.0)
        |  UNION ALL
        |  SELECT 'no_big_order' AS tag, count(*) AS n_customers
        |  FROM v_naaj_customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM v_naaj_orders
        |                          WHERE o_totalprice > 300000.0)
        |  UNION ALL
        |  SELECT 'null_poisoned' AS tag, count(*) AS n_customers
        |  FROM v_naaj_customer
        |  WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 1e9
        |                                      THEN o_custkey END
        |                          FROM v_naaj_orders)
        |) ORDER BY tag""".stripMargin)
  }

  val nullAwareAntiSql: String =
    """SELECT tag, n_customers FROM (
      |  SELECT 'has_big_order' AS tag, count(*) AS n_customers
      |  FROM customer
      |  WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                      WHERE o_totalprice > 300000.0)
      |  UNION ALL
      |  SELECT 'no_big_order' AS tag, count(*) AS n_customers
      |  FROM customer
      |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                          WHERE o_totalprice > 300000.0)
      |  UNION ALL
      |  SELECT 'null_poisoned' AS tag, count(*) AS n_customers
      |  FROM customer
      |  WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 1e9
      |                                      THEN o_custkey END
      |                          FROM orders)
      |) ORDER BY tag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_full_outer" -> fullOuterJoin,
    "join_salted_skew" -> saltedJoin,
    "join_null_aware_anti" -> nullAwareAnti,
    "agg_session_stats" -> sessionAgg)

  val oracles: Map[String, String] = Map(
    "join_full_outer" -> fullOuterJoinSql,
    "join_salted_skew" -> saltedJoinSql,
    "join_null_aware_anti" -> nullAwareAntiSql,
    "agg_session_stats" -> sessionAggSql)
}
