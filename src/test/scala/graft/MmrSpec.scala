package graft

import graft.operators.Tables

/** MMR diversified re-ranking: the DuckDB oracle pins exact values;
  * this pins the greedy semantics against a serial plain-Scala replay
  * of the same fixed-point pipeline (quantize → cosine pool → unrolled
  * λ=0.7 greedy selection with the score-then-id tie-break). */
class MmrSpec extends SparkSpec {

  test("mmr rerank replays from a serial greedy simulation") {
    val dir = sf("sf0.001")
    val got = graft.sim.Mmr.mmrRerank(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("mmr_rank")) ->
        (r.getAs[Long]("cand_id"), r.getAs[Double]("rel"))).toMap

    val vecs = Tables.t(spark, dir, "embeddings").collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 10000d + 0.5d).toLong).toArray
    }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      def dot(x: Array[Long], y: Array[Long]): Long =
        x.indices.map(i => x(i) * y(i)).sum
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    }
    val want = (0L until 8L).flatMap { q =>
      val pool = vecs.keys.filter(_ != q).toSeq
        .map(c => c -> cos(vecs(q), vecs(c)))
        .sortBy { case (c, rel) => (-rel, c) }.take(12)
      var selected = Vector(pool.head)
      for (_ <- 2 to 5) {
        val pick = pool.filterNot(p => selected.exists(_._1 == p._1))
          .map { case (c, rel) =>
            val ms = selected.map(s => cos(vecs(c), vecs(s._1))).max
            (c, rel, 0.7 * rel - 0.3 * ms)
          }
          .minBy { case (c, _, score) => (-score, c) }
        selected :+= (pick._1 -> pick._2)
      }
      selected.zipWithIndex.map { case ((c, rel), i) =>
        (q, (i + 1).toLong) -> (c, rel)
      }
    }.toMap
    assert(got === want)
    // the greedy invariants: 5 distinct picks per query, rank-1 = argmax rel
    (0L until 8L).foreach { q =>
      val picks = (1L to 5L).map(r => got((q, r))._1)
      assert(picks.distinct.size == 5, s"query $q repeated a pick")
    }
  }
}
