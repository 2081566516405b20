package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Tables.t
import graft.Cache.CacheOps

/** Fourth analytics batch: the 2-D skyline (Pareto front) operator and
  * per-node local clustering coefficients on the co-purchase graph.
  *
  * Reference context: the reference engine (/root/reference/src/) has no
  * analytics surface; these are SURVEY §2.4 harness-capability queries.
  * Exactness discipline as everywhere on the board: prices quantize to
  * integer cents up front, every aggregate is an order-independent
  * integer sum/min/max/count, ratios are integer `DIV` at a documented
  * scale, and output orders are total (value, then id).
  */
object Analytics4 {

  // ---------------------------------------------------------------------
  // Skyline / Pareto front
  // ---------------------------------------------------------------------

  /** Price bucket width (cents) for the skyline grid prefilter. */
  private val bucketCents = 2500L // $25 buckets over the ~$900–$2100 range

  /** 2-D skyline (Pareto front) over `part`: minimize retail price,
    * maximize size — "no other part is at most as expensive AND at least
    * as big, strictly better in one". The multi-objective shortlist
    * operator every catalog/quality pipeline runs (Börzsönyi et al.,
    * ICDE 2001 "The Skyline Operator").
    *
    * Scale shape — the naive formulations both fail at 100 TB: the
    * dominance anti-join is O(n²), and the textbook sort-sweep is ONE
    * global sort through a single-partition window. This implementation
    * is the standard grid-pruned two-phase form:
    *   1. one partial+final agg to ≤ ~50 price-bucket cells, a running
    *      max over that tiny staircase (driver-sized window), and a
    *      broadcast join back: a row survives only if its size exceeds
    *      the max size of every strictly-cheaper bucket. Pruned rows are
    *      provably dominated (a strictly-cheaper bucket's witness has
    *      strictly lower price and ≥ size); if a row survives, any
    *      dominator of it also survives or shares its pruner — so the
    *      exact sweep over survivors returns the true skyline.
    *   2. the exact sweep runs its two windows (strictly-cheaper running
    *      max via a RANGE frame; same-price max) over the surviving
    *      handful of rows — the single-partition window touches only the
    *      staircase-sized candidate set, never the table.
    */
  def paretoFront(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part").select(col("p_partkey"),
      (col("p_retailprice").cast(DecimalType(18, 2)) * 100).cast("long")
        .as("price_cents"),
      col("p_size").cast("long").as("p_size"))
      .withColumn("bucket", expr(s"price_cents DIV $bucketCents"))
    // staircase: per-bucket max size, then max over strictly-cheaper buckets
    val stairs = p.groupBy("bucket").agg(max("p_size").as("bmax"))
      .withColumn("prevmax", max("bmax").over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)))
      .select("bucket", "prevmax")
    val survivors = p.join(broadcast(stairs), "bucket")
      .filter(col("prevmax").isNull || col("p_size") > col("prevmax"))
      .select("p_partkey", "price_cents", "p_size")
    // exact sweep on the pruned candidate set
    val cheaperMax = max("p_size").over(Window.orderBy("price_cents")
      .rangeBetween(Window.unboundedPreceding, -1))
    val samePriceMax = max("p_size").over(Window.partitionBy("price_cents"))
    survivors
      .withColumn("m1", cheaperMax)
      .withColumn("m2", samePriceMax)
      .filter((col("m1").isNull || col("p_size") > col("m1")) &&
        col("p_size") === col("m2"))
      .select("p_partkey", "price_cents", "p_size")
      .orderBy("price_cents", "p_size", "p_partkey")
  }

  /** Oracle: the same skyline semantics via the sweep windows (DuckDB
    * RANGE frames over the whole table — the oracle can afford the
    * serial sort the distributed plan prunes around). */
  val paretoFrontSql: String =
    """WITH p AS (
      |  SELECT p_partkey,
      |         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
      |         CAST(p_size AS BIGINT) AS p_size
      |  FROM part
      |), w AS (
      |  SELECT *,
      |         max(p_size) OVER (ORDER BY price_cents
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
      |         max(p_size) OVER (PARTITION BY price_cents) AS m2
      |  FROM p
      |)
      |SELECT p_partkey, price_cents, p_size FROM w
      |WHERE (m1 IS NULL OR p_size > m1) AND p_size = m2
      |ORDER BY price_cents, p_size, p_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // Local clustering coefficient
  // ---------------------------------------------------------------------

  private val lccDegreeCap = 16 // same co-purchase projection cap as graph_triangles

  /** Per-node local clustering coefficient on the supplier co-purchase
    * graph (two suppliers adjacent iff they ship a common part, parts
    * capped at degree 16 exactly as `graph_triangles`), reported as a
    * bounded histogram: decile bucket of lcc = 2·tri(v) / (deg(v)·(deg(v)−1))
    * → node count, triangle-end sum, degree sum. The Watts–Strogatz
    * local density screen a link/content-graph pipeline runs to find
    * tightly-knit clusters worth mining.
    *
    * Exactness: lcc is computed in integer permille —
    * (2000·tri) DIV (deg·(deg−1)) — then bucketed DIV 100; every term is
    * a BIGINT count. Nodes with deg < 2 are excluded (coefficient
    * undefined).
    *
    * Scale shape: identical posture to `graph_triangles` — the projection
    * join is bounded by the per-part degree cap, triangles come from the
    * degree-oriented wedge join (Ortmann–Brandes orientation keeps wedge
    * fanout at the oriented out-degree, O(m^1.5) total), and the output
    * is an 11-cell histogram. The per-node triangle explode and the
    * degree agg are both node-keyed single shuffles.
    */
  def clusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    val pairs = t(spark, dir, "lineitem")
      .select(col("l_partkey").as("part"), col("l_suppkey").as("supp"))
      .distinct().staged
    val eligible = pairs.groupBy("part").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= lccDegreeCap).select("part")
    val p2 = pairs.join(eligible, "part")
    val und = p2.select(col("part"), col("supp").as("u"))
      .join(p2.select(col("part"), col("supp").as("v")), "part")
      .filter(col("u") < col("v"))
      .select("u", "v").distinct().staged
    val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val edges = graft.sim.GraphOps.orientByDegree(und).staged
    val wedges = edges.select(col("u").as("a"), col("v").as("b"))
      .join(edges.select(col("u").as("b"), col("v").as("c")), "b")
    val tri = wedges.join(edges,
      wedges("a") === edges("u") && wedges("c") === edges("v"), "left_semi")
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("tri"))
    deg.filter(col("deg") >= 2)
      .join(tri, Seq("n"), "left")
      .select(col("n"), col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("bucket",
        expr("((2000 * tri) DIV (deg * (deg - 1))) DIV 100"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_nodes"), sum("tri").as("sum_tri"),
        sum("deg").as("sum_deg"))
      .orderBy("bucket")
  }

  def clusteringCoeffSql: String =
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_partkey AS part, l_suppkey AS supp FROM lineitem
       |), eligible AS (
       |  SELECT part FROM pairs GROUP BY part HAVING count(*) <= $lccDegreeCap
       |), und AS (
       |  SELECT DISTINCT a.supp AS u, b.supp AS v
       |  FROM pairs a JOIN eligible USING (part) JOIN pairs b USING (part)
       |  WHERE a.supp < b.supp
       |), deg AS (
       |  SELECT n, count(*) AS deg FROM (
       |    SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und
       |  ) GROUP BY n
       |), tri AS (
       |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM und e1 JOIN und e2 ON e1.v = e2.u
       |  WHERE EXISTS (SELECT 1 FROM und e3 WHERE e3.u = e1.u AND e3.v = e2.v)
       |), pertri AS (
       |  SELECT n, count(*) AS tri FROM (SELECT unnest([a, b, c]) AS n FROM tri)
       |  GROUP BY n
       |), nodes AS (
       |  SELECT d.n, d.deg, coalesce(t.tri, 0) AS tri
       |  FROM deg d LEFT JOIN pertri t ON d.n = t.n
       |  WHERE d.deg >= 2
       |)
       |SELECT ((2000 * tri) // (deg * (deg - 1))) // 100 AS bucket,
       |       count(*) AS n_nodes,
       |       CAST(sum(tri) AS BIGINT) AS sum_tri,
       |       CAST(sum(deg) AS BIGINT) AS sum_deg
       |FROM nodes GROUP BY 1 ORDER BY bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_pareto_front" -> ((s, d) => paretoFront(s, d)),
    "graph_clustering_coeff" -> ((s, d) => clusteringCoeff(s, d)))

  val oracles: Map[String, String] = Map(
    "window_pareto_front" -> paretoFrontSql,
    "graph_clustering_coeff" -> clusteringCoeffSql)
}
