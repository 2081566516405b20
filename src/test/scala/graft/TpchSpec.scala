package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Tpch3

/** Plan-shape + semantics checks for the adapted TPC-H remainder:
  * the properties that make each query scale are asserted
  * mechanically, mirroring PlanShapeSpec's approach. */
class TpchSpec extends SparkSpec {

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q7 broadcasts every dim; only fact-side joins shuffle") {
    val p = planString(Tpch3.volumeShipping(spark, sf("sf0.001")))
    // customer, supplier, nation x2 all broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
    // the ship-date window pushes into the lineitem scan
    assert(p.contains("PushedFilters") &&
      p.matches("(?s).*GreaterThanOrEqual\\(l_shipdate.*"), p.take(2000))
  }

  test("q8 market share is exact: shares in [0,1] and volumes consistent") {
    val rows = Tpch3.marketShare(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nv = r.getAs[Double]("nation_volume")
      val tv = r.getAs[Double]("total_volume")
      val share = r.getAs[Double]("mkt_share")
      assert(nv >= 0 && nv <= tv, s"volumes inconsistent: $nv > $tv")
      assert(share === nv / tv, "share must be the exact ratio")
    }
  }

  test("q17 threshold compare is integer-exact (boundary line excluded)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // synthetic: part 1 has lines qty 1 and 9 (avg 5, 20% = 1.0) —
    // qty 1 is NOT < 1.0, so nothing qualifies; part 2 has qty 1 and
    // 99 (20% of avg = 10.0) — qty 1 qualifies.
    val li = Seq((1L, 1.0, 10.0), (1L, 9.0, 10.0), (2L, 1.0, 30.0), (2L, 99.0, 10.0))
      .toDF("pk", "qty", "price")
      .select(col("pk"),
        (col("qty").cast("decimal(18,2)") * 100).cast("long").as("qs"),
        col("price").cast("decimal(18,2)").as("price"))
    val perPart = li.groupBy(col("pk").as("apk"))
      .agg(sum("qs").as("sum_qs"), count(lit(1)).as("n_lines"))
    val qualifying = li.join(perPart, col("pk") === col("apk"))
      .filter(col("qs") * 5 * col("n_lines") < col("sum_qs"))
      .select("pk", "qs").collect()
    assert(qualifying.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((2L, 100L)))
  }

  test("q19 disjunctive filter stays above a broadcast part join") {
    val p = planString(Tpch3.disjunctiveRevenue(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // no cartesian / nested-loop fallback from the OR predicate
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("q21 computes sole-return attribution without a fact self-join") {
    val p = planString(Tpch3.soleReturnSuppliers(spark, sf("sf0.001")))
    // the essential property: NO row-level join of lineitem to lineitem
    // — exactly two joins total (grouped⋈grouped on orderkey, then the
    // broadcast supplier attach), both post-aggregation
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(1500))
    // formatted explain lists each node once in the tree and once in the
    // details — count only the numbered detail headers
    val joins = "\\(\\d+\\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r.findAllIn(p).size
    assert(joins === 2, s"expected 2 joins (agg-agg + dim attach), got $joins:\n${p.take(2000)}")
  }

  test("q22 anti-join excludes every customer with a recent order") {
    import org.apache.spark.sql.functions._
    val out = Tpch3.idleCustomers(spark, sf("sf0.001"))
    val total = out.agg(coalesce(sum("numcust"), lit(0L))).collect()(0).getLong(0)
    val t = graft.operators.Tables.t _
    val withRecent = t(spark, sf("sf0.001"), "customer")
      .join(t(spark, sf("sf0.001"), "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val all = t(spark, sf("sf0.001"), "customer").count()
    assert(total <= all - withRecent,
      s"idle customers ($total) exceed dormant customers (${all - withRecent})")
  }

  test("q13 keeps zero-order customers and the histogram conserves the customer set") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val out = graft.operators.Tpch3.customerDistribution(spark, dir).collect()
      .map(r => (r.getAs[Long]("c_count"), r.getAs[Long]("custdist")))
    val t = graft.operators.Tables.t _
    val nCust = t(spark, dir, "customer").count()
    // the histogram partitions ALL customers — the left join's whole point
    assert(out.map(_._2).sum === nCust)
    // zero-bucket equals customers with no qualifying (non-5-LOW) order
    val withQual = t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(out.toMap.getOrElse(0L, 0L) === nCust - withQual)
    // ordering: custdist descending, c_count descending on ties
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 > b._1))
      case _ =>
    }
  }
}
