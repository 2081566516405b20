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

  test("bucketed co-located join equals the direct join (semantics)") {
    // plan shape (SortMergeJoin with no Exchange below it) is asserted
    // in PlanShapeSpec against the same query — here we pin semantics
    val got = Formats.bucketedJoin(spark, sf("sf0.001")).collect().toSeq
    val direct = Tables.t(spark, sf("sf0.001"), "orders")
      .join(Tables.t(spark, sf("sf0.001"), "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_items"),
        org.apache.spark.sql.functions.sum(col("l_quantity")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(got === direct)
    assert(got.nonEmpty)
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

  test("dim-side predicate reaches the fact scan as a dynamicpruning partition filter") {
    val df = Formats.dppPrune(spark, sf("sf0.001"))
    val rows = df.collect()
    // only the length>=6 types survive, via the runtime-pruned fact scan
    assert(rows.map(_.getString(0)).toSeq.sorted === Seq("purchase", "signup"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruningexpression"), plan.take(1500))
  }

  test("text source round-trip: every customer name survives as one line") {
    val dir = sf("sf0.001")
    val got = Formats.textRoundTrip(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = Tables.t(spark, dir, "customer").select("c_name").collect()
      .map(_.getString(0)).map { n =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(n.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(md.take(15), 16), n.length.toLong)
      }.sorted
    assert(got.toSeq === want.toSeq)
  }

  test("binaryFile source: content bytes, not just listings, round-trip") {
    val got = Formats.binaryMeta(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 16)
    got.foreach { case (i, len, h) =>
      val content = (0 until (i.toInt + 1) * 3).map(j => s"blob_${i}_$j").mkString(",")
      assert(len === content.length.toLong)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(h === java.lang.Long.parseLong(md.take(15), 16), s"file $i")
    }
  }
}
