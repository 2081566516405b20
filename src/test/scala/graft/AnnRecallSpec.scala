package graft

import graft.sim.Similarity

/** Approximate-NN quality: recall of the LSH and IVF paths against the
  * exact brute-force top-k ground truth. Approximation is allowed to
  * miss neighbors — but it must (a) never invent cosines (every
  * returned pair's cosine equals the exact one) and (b) keep recall
  * above a floor that would catch a broken bucketing scheme. */
class AnnRecallSpec extends SparkSpec {

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3).toLong))
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }

  test("IVF top-k is a subset of exact cosine ordering with exact scores") {
    val exact = Similarity.cosineTopK(spark, sf("sf0.001"), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(spark, sf("sf0.001"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty)
    // every IVF-returned cosine that appears in the exact top-50 matches
    // exactly (the scorer is shared and exact; only the candidate set is
    // approximate)
    val mismatches = ivf.collect {
      case (q, c, cos) if exact.contains((q, c)) && exact((q, c)) != cos => (q, c)
    }
    assert(mismatches.isEmpty, s"cosine drift: $mismatches")
  }

  test("IVF nprobe=2 recall@5 vs brute force is reasonable on sf0.001") {
    val gtRaw = Similarity.cosineTopK(spark, sf("sf0.001"), k = 5)
    val gt = gtRaw.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val ivf = Similarity.ivfTopK(spark, sf("sf0.001"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recalls = gt.map { case (q, truth) =>
      ivf.get(q).map(found => found.intersect(truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // random 64-d embeddings are a worst case for coarse quantization;
    // the floor catches structural breakage (empty cells, wrong joins),
    // not tuning quality
    assert(mean > 0.15, s"mean recall@5 = $mean")
    assert(recalls.exists(_ > 0.3), s"no query with decent recall: $recalls")
  }
}
