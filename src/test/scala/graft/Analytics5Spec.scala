package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics5, Tables}

/** Label propagation: the DuckDB oracle pins exact values; this pins the
  * semantics against a serial plain-Scala replay of the same synchronous
  * update rule (self-vote + most-frequent-neighbor-label, min tie-break). */
class Analytics5Spec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("label propagation replays from a serial synchronous simulation") {
    val got = Analytics5.labelPropagation(spark, dir).collect()
      .map(r => r.getAs[Long]("csize") -> r.getAs[Long]("n_communities")).toMap

    val pairs = Tables.t(spark, dir, "lineitem")
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    pairs.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    val nodes = adj.keys.toSeq.sorted
    var labels = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      labels = nodes.map { n =>
        // self-vote + one vote per incident edge (multi-edges impossible:
        // the pair list is distinct), winner = max count, then min label
        val votes = (labels(n) :: adj(n).map(labels))
          .groupBy(identity).view.mapValues(_.size).toSeq
        n -> votes.maxBy { case (l, c) => (c, -l) }._1
      }.toMap
    }
    val want = labels.values.groupBy(identity).map(_._2.size.toLong)
      .groupBy(identity).map { case (sz, g) => sz -> g.size.toLong }
    assert(got === want)
    // communities actually merged: fewer labels than nodes
    assert(labels.values.toSet.size < nodes.size)
  }
}
