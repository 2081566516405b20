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

  test("personalized pagerank replays from a serial integer simulation") {
    val got = Analytics5.personalizedPageRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    val pairs = Tables.t(spark, dir, "lineitem")
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    pairs.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    val S = 1000000000000L
    val T = 15L * S / 100L
    val lms = adj.keys.filter(_ % 2 == 1).toSeq.sorted.take(8)
    var ranks: Map[(Long, Long), Long] = lms.map(lm => (lm, lm) -> S).toMap
    for (_ <- 1 to 3) {
      // same integer op order as the operator: per-contribution
      // rank DIV deg, per-(lm, node) sum, THEN 85·Σ DIV 100, teleport
      // added by the union-sum
      val contrib = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
      ranks.foreach { case ((lm, u), r) =>
        val c = r / adj(u).size
        adj(u).foreach(v => contrib((lm, v)) += c)
      }
      val next = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
      contrib.foreach { case (k, s) => next(k) = 85L * s / 100L }
      lms.foreach(lm => next((lm, lm)) += T)
      ranks = next.toMap
    }
    val want = ranks.toSeq.groupBy(_._1._1).toSeq.flatMap { case (lm, rs) =>
      rs.map { case ((_, n), r) => (n, r) }
        .sortBy { case (n, r) => (-r, n) }.take(5).zipWithIndex
        .map { case ((n, r), i) => ((lm - 1) / 2, n, r, (i + 1).toLong) }
    }.sortBy(x => (x._1, x._4))
    assert(got === want)
    // restart mass keeps each landmark's own node ranked (locality held)
    got.groupBy(_._1).foreach { case (sk, rows) =>
      assert(rows.exists(r => r._2 == sk * 2 + 1), s"landmark $sk lost itself")
    }
  }
}
