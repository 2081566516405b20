package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics4, Tables}

/** Semantic invariants of the fourth analytics batch — brute-force
  * plain-Scala replays of the skyline and the clustering coefficient,
  * independent of the grid-pruned / wedge-oriented distributed forms. */
class Analytics4Spec extends SparkSpec {

  test("pareto front: matches the O(n^2) dominance definition exactly") {
    val dir = sf("sf0.001")
    val got = Analytics4.paretoFront(spark, dir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("price_cents"),
        r.getAs[Long]("p_size")))
    val rows = Tables.t(spark, dir, "part")
      .select(col("p_partkey").cast("long"),
        (col("p_retailprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominates(d: (Long, Long, Long), r: (Long, Long, Long)): Boolean =
      d._2 <= r._2 && d._3 >= r._3 && (d._2 < r._2 || d._3 > r._3)
    val want = rows.filter(r => !rows.exists(d => dominates(d, r)))
      .sortBy(r => (r._2, r._3, r._1))
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
    // the front is a strict staircase: price increases, size increases
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._2)
        if (a._2 < b._2) assert(b._3 > a._3)
      case _ =>
    }
  }

  test("clustering coeff: histogram replays from brute-force neighbor intersection") {
    val dir = sf("sf0.001")
    val got = Analytics4.clusteringCoeff(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("sum_tri"), r.getAs[Long]("sum_deg")))
    val pairs = Tables.t(spark, dir, "lineitem")
      .select(col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val eligible = pairs.groupBy(_._1).filter(_._2.length <= 16).keySet
    val byPart = pairs.filter(p => eligible(p._1)).groupBy(_._1)
      .map { case (_, ps) => ps.map(_._2).toSet }
    val und = byPart.toSeq.flatMap { ss =>
      val s = ss.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.toSet
    val adj = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.toSeq.map { case (n, nbrs) =>
      val tri = nbrs.toSeq.map(m => (adj(m) & nbrs).size).sum / 2
      (n, nbrs.size.toLong, tri.toLong)
    }.filter(_._2 >= 2)
    val want = nodes.groupBy { case (_, deg, tri) =>
      (2000 * tri / (deg * (deg - 1))) / 100
    }.map { case (b, ns) =>
      (b, ns.size.toLong, ns.map(_._3).sum, ns.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    // coefficient buckets live in [0, 10] (lcc permille <= 1000)
    assert(got.forall(r => r._1 >= 0 && r._1 <= 10))
  }
}
