package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Formats
import graft.operators.Tables

/** Source/sink round-trips and partition pruning. */
class FormatsSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_formats").toString

  test("csv and json round-trips preserve data") {
    val df = Tables.t(spark, sf("sf0.001"), "nation")
    for (fmt <- Seq("csv", "json", "parquet")) {
      val back = Formats.roundTrip(spark, df, s"$tmp/rt_$fmt", fmt)
        .orderBy("n_nationkey").collect().toSeq
      assert(back === df.orderBy("n_nationkey").collect().toSeq, fmt)
    }
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import org.apache.spark.sql.functions.col
    // external tables via option("path", ...) — warehouse.dir is a
    // static conf and can't be set on a live session
    val wh = s"$tmp/warehouse"
    val orders = Tables.t(spark, sf("sf0.001"), "orders")
    val lineitem = Tables.t(spark, sf("sf0.001"), "lineitem")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/orders_b").saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    // disable broadcast so the bucket co-location (not broadcast) is
    // what avoids the shuffle — at real scale neither side broadcasts
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() === lineitem.count()) // FK join preserves rows
      val plan = joined.queryExecution.executedPlan.toString
      // both sides bucketed on the join key with equal bucket counts →
      // SortMergeJoin with NO shuffle Exchange on either side
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("ShuffleExchange"), plan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("partitioned parquet write prunes partitions on filtered read") {
    val df = Tables.t(spark, sf("sf0.001"), "customer")
    Formats.partitionedWrite(spark, df, s"$tmp/part_cust", "c_mktsegment")
    val pruned = Formats.prunedRead(spark, s"$tmp/part_cust", "c_mktsegment", "BUILDING")
    val expected = df.filter(col("c_mktsegment") === "BUILDING").count()
    assert(pruned.count() === expected)
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the partition filter must hit the file index, not a row-level Filter
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[.*c_mktsegment.*\\].*"), plan.take(1200))
  }
}
