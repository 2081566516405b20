package graft

import org.apache.spark.sql.functions._
import graft.functions.{BottomKAgg, Portable}

/** The typed Aggregator (UDAF surface): partial+final correctness,
  * merge associativity under repartitioning, and agreement with the
  * windowed-builtin bottom-k harness query. */
class BottomKAggSpec extends SparkSpec {

  test("bottom-k aggregator returns the k smallest per group, any partitioning") {
    import spark.implicits._
    val bk = udaf(new BottomKAgg(3))
    // deterministic values via the portable hash of the stringified id
    val df = (1L to 100L).toDF("v")
      .select((col("v") % 4).as("g"),
        pmod(Portable.hash60(col("v").cast("string")), lit(1000L)).as("h"))
    for (parts <- Seq(1, 3, 7)) {
      val got = df.repartition(parts).groupBy("g").agg(bk(col("h")).as("bottom"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val want = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(3).toList).toMap
      assert(got === want, s"parts=$parts")
    }
  }

  test("aggregator agrees with the windowed-builtin sample_bottomk query") {
    import spark.implicits._
    val bk = udaf(new BottomKAgg(5))
    val viaAgg = graft.operators.Tables.t(spark, sf("sf0.001"), "customer")
      .select(col("c_mktsegment"),
        Portable.hash60(concat_ws("_", lit("bk"), col("c_custkey"))).as("h"))
      .groupBy("c_mktsegment").agg(bk(col("h")).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    val viaWindow = graft.operators.Sketches.bottomK(spark, sf("sf0.001"), k = 5)
      .collect().groupBy(_.getAs[String]("c_mktsegment"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("h")).toList).toMap
    assert(viaAgg === viaWindow)
  }
}
