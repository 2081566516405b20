package graft

import graft.sim.Similarity

/** Approximate-NN quality: recall of the LSH and IVF paths against the
  * exact brute-force top-k ground truth. Approximation is allowed to
  * miss neighbors — but it must (a) never invent cosines (every
  * returned pair's cosine equals the exact one) and (b) keep recall
  * above a floor that would catch a broken bucketing scheme. */
class AnnRecallSpec extends SparkSpec {

  test("multiprobe recall dominates single-probe per query and lifts overall") {
    val rows = graft.sim.Similarity.annMultiprobe(spark, sf("sf0.001")).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq === (0L to 7L))
    rows.foreach { r =>
      // the multi-probe candidate set contains the single-probe set, so
      // per-query hits can only grow
      assert(r.getAs[Long]("n_hits_multi") >= r.getAs[Long]("n_hits_single"),
        s"query ${r.getAs[Long]("query_id")}: multi < single")
      assert(r.getAs[Double]("recall_multi") >= 0.0 &&
        r.getAs[Double]("recall_multi") <= 1.0)
    }
    val liftS = rows.map(_.getAs[Long]("n_hits_single")).sum
    val liftM = rows.map(_.getAs[Long]("n_hits_multi")).sum
    assert(liftM > liftS, s"probing must lift total hits ($liftS -> $liftM)")
  }

  test("probe curve: budgets 1/9/37, monotone non-decreasing recall, endpoints match the paired report") {
    val curve = graft.sim.Similarity.annProbeCurve(spark, sf("sf0.001")).collect()
    assert(curve.map(_.getAs[Int]("budget")).toSeq === Seq(0, 1, 2))
    assert(curve.map(_.getAs[Long]("n_probes")).toSeq === Seq(1L, 9L, 37L))
    val recalls = curve.map(_.getAs[Double]("recall")).toSeq
    assert(recalls === recalls.sorted,
      s"wider Hamming radius supersets the candidate pool, recall can't drop: $recalls")
    recalls.foreach(r => assert(r >= 0.0 && r <= 1.0))
    // radius 0 / radius 1 are exactly the paired report's two arms
    val paired = graft.sim.Similarity.annMultiprobe(spark, sf("sf0.001")).collect()
    val nExact = paired.map(_.getAs[Long]("n_exact")).sum.toDouble
    assert(recalls(0) === paired.map(_.getAs[Long]("n_hits_single")).sum / nExact)
    assert(recalls(1) === paired.map(_.getAs[Long]("n_hits_multi")).sum / nExact)
  }

  test("binary quantization: hammings re-derivable from sign bits; rerank beats raw-LSH recall") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    // recompute each reported pair's Hamming distance from raw sign bits
    val signs = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map { r =>
        val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        r.getAs[Long]("vec_id") ->
          v.map(x => math.floor(x.toDouble * 10000d + 0.5d).toLong > 0L).toArray
      }.toMap
    val top = Similarity.bqTopK(spark, dir).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val (q, c) = (signs(r.getAs[Long]("query_id")), signs(r.getAs[Long]("cand_id")))
      val want = q.zip(c).count { case (a, b) => a != b }.toLong
      assert(r.getAs[Long]("hamming") === want)
      assert(r.getAs[Double]("cosine") >= -1.0 && r.getAs[Double]("cosine") <= 1.0)
    }
    // the asymmetric rerank is the point: BQ recall must clear the
    // bucket-only LSH path by a wide margin (measured 0.600 vs 0.125)
    val rows = Similarity.bqRecall(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq === (0L to 7L))
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean >= 0.4, s"BQ+rerank mean recall $mean below floor")
  }

  test("ivf-bq: every candidate comes from a probed cell; rerank cosines are exact") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val (corpus, cent) = graft.sim.Clustering.train(spark, dir)
    val cells = graft.sim.Clustering.assign(corpus, cent)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    val cm = cent.collect().map { r =>
      r.getAs[Long]("cid") -> r.getAs[scala.collection.Seq[Long]]("c").toArray
    }
    def quantize(v: scala.collection.Seq[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 10000d + 0.5d).toLong).toArray
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        quantize(r.getAs[scala.collection.Seq[Float]]("embedding"))).toMap
    val probes: Map[Long, Set[Long]] = emb.filter(_._1 < 8).map { case (qid, q) =>
      qid -> cm.map { case (cid, c) => (l2(q, c), cid) }
        .sortBy(identity).take(2).map(_._2).toSet
    }
    val rows = Similarity.ivfBqTopK(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, cid) = (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))
      assert(probes(qid).contains(cells(cid)),
        s"query $qid returned cand $cid from un-probed cell ${cells(cid)}")
      // the reported cosine is the exact full-precision one
      val (a, b) = (emb(qid), emb(cid))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val want = dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
      assert(r.getAs[Double]("cosine") === want)
    }
    val rec = Similarity.ivfBqRecall(spark, dir).collect()
    assert(rec.map(_.getAs[Long]("query_id")).toSeq === (0L to 7L))
    rec.foreach(r => assert(r.getAs[Double]("recall") >= 0.0 &&
      r.getAs[Double]("recall") <= 1.0))
  }

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

  test("MRL recall: report shape sound; truncation of isotropic vectors scores near chance") {
    val r = Similarity.mrlRecall(spark, sf("sf0.001")).collect()
    assert(r.map(_.getLong(0)).toSeq === (0L to 7L), "one row per panel query")
    r.foreach { row =>
      assert(row.getAs[Long]("n_exact") === 5L)
      val recall = row.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall === row.getAs[Long]("n_hits").toDouble / 5.0)
    }
    // isotropic random embeddings have NO Matryoshka structure: a 16-dim
    // prefix must NOT preserve the 64-dim ranking. High recall here would
    // mean the truncated path is secretly reading full vectors.
    val mean = r.map(_.getAs[Double]("recall")).sum / r.length
    assert(mean < 0.5, f"mean prefix recall $mean%.2f too high for random vectors")
  }

  test("bucketed near-dup pairs equal brute force on a corpus with planted dups") {
    // 120 random 64-d unit-ish vectors + 12 planted near-dups (tiny
    // perturbations, cosine ≈ 0.999) — exercises the non-empty case the
    // testdata (pure random vectors, max pair cosine ≈ 0.51) cannot.
    val rnd = new scala.util.Random(7)
    val base = Array.fill(120)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val dups = (0 until 12).map { i =>
      (200L + i, base(i).map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      dups.map { case (id, v) => (id, v.toSeq) }
    import spark.implicits._
    val emb = rows.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val qn = Similarity.quantizedFrom(emb)
    val tau = 0.95
    val got = Similarity.nearDupPairsFrom(qn, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // independent exact reference (plain Scala, same quantization)
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 10000d + 0.5d).toLong)
    val qv = rows.map { case (id, v) => id -> quant(v.toArray) }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val ids = rows.map(_._1).sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      c = cos(qv(a), qv(b)) if c >= tau
    } yield (a, b, c)).toArray
    assert(want.length === 12, s"expected the 12 planted pairs, got ${want.length}")
    assert(got.toSeq === want.toSeq,
      s"bucketed path lost pairs: got=${got.toSeq} want=${want.toSeq}")
  }

  test("near-dup collapse: exact-copy clusters expand to every member pair") {
    // the dup-heavy regime the collapse-first rewrite exists for: exact
    // copies share one quantized vector, so the banded search must run
    // once per DISTINCT vector and the member expansion must recover
    // every within-cluster pair (C(n,2)) and every cross-cluster member
    // product — byte-identical to brute force over all ids.
    val rnd = new scala.util.Random(11)
    val base = Array.fill(30)(Array.fill(64)(rnd.nextGaussian().toFloat))
    // clusters: vector i gets (i % 4) + 1 exact copies (sizes 1..4);
    // vector 900 below additionally near-dups base(0)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Seq[Float])]()
    var id = 0L
    for (i <- base.indices; _ <- 0 until (i % 4) + 1) {
      rows += ((id, base(i).toSeq)); id += 1
    }
    // a near (not exact) dup of base(0), forming a cross-GROUP pair
    rows += ((900L, base(0).map(x => x + 0.005f * rnd.nextGaussian().toFloat).toSeq))
    import spark.implicits._
    val emb = rows.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val tau = 0.95
    val got = Similarity.nearDupPairsFrom(Similarity.quantizedFrom(emb), tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 10000d + 0.5d).toLong).toArray
    val qv = rows.map { case (i, v) => i -> quant(v) }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val ids = rows.map(_._1).sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      c = cos(qv(a), qv(b)) if c >= tau
    } yield (a, b, c)).toArray
    // sanity on the fixture itself: Σ C(n_i, 2) within-cluster pairs
    // (sizes cycle 1,2,3,4 → 0+1+3+6 per cycled group of 4) + the one
    // cross-cluster near-dup pairing with ALL of base(0)'s copies
    val withins = base.indices.map(i => (i % 4) + 1).map(n => n * (n - 1) / 2).sum
    assert(want.count { case (a, b, _) => a < 900 && b < 900 } === withins)
    assert(want.count { case (_, b, _) => b === 900L } === 1,
      "base(0) has exactly 1 copy (size-1 cluster); its near-dup pairs once")
    assert(got.toSeq === want.toSeq,
      s"collapse path diverged from brute force: got=${got.length} want=${want.length}")
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

  test("driver-side hyperplane sign matrix equals the engine's hash60 rule") {
    // Similarity.planeSigns is derived with java MessageDigest on the
    // driver; the oracle contract says it IS Portable.hash60("p_i") mod 2
    // mapped to ±1. Pin the two derivations together for every (p, i) so
    // a refactor of either side can't silently skew the LSH family.
    import org.apache.spark.sql.functions._
    import graft.functions.Portable
    val viaSpark = spark.range(16L * 64L)
      .select((col("id") / 64).cast("long").as("p"), pmod(col("id"), lit(64L)).as("i"))
      .select(col("p"), col("i"),
        when(pmod(Portable.hash60(concat_ws("_", col("p"), col("i"))), lit(2L)) === 1L,
          lit(1L)).otherwise(lit(-1L)).as("s"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2)).toMap
    for (p <- 0 until 16; i <- 0 until 64)
      assert(Similarity.planeSigns(p)(i) === viaSpark((p, i)), s"($p,$i)")
  }

  test("ivf recall query reports per-query recall in [0,1] over the full panel") {
    val rows = Similarity.ivfRecall(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (0L to 7L), rows.map(_._1).mkString(","))
    rows.foreach { case (q, nExact, nHits, rec) =>
      assert(nExact == 5L, s"query $q panel size")
      assert(nHits >= 0L && nHits <= nExact, s"query $q hits")
      assert(rec == nHits.toDouble / nExact, s"query $q recall arithmetic")
    }
    assert(rows.exists(_._4 > 0.0), "IVF found nothing at all")
  }

  test("hard negatives never share the query's label and rank contiguously") {
    val rows = Similarity.hardNegatives(spark, sf("sf0.001"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, ql, c, cl, _, _) =>
      assert(ql != cl, s"query $q got same-label candidate $c")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._6).sorted.toSeq == (1L to rs.length).toSeq, s"ranks of $q")
      // cosines non-increasing in rank order
      val cos = rs.sortBy(_._6).map(_._5)
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"ordering of $q")
    }
    // the mined negative is never a better match than the unrestricted
    // top-1 (restricting the candidate pool cannot improve the best score)
    val best = Similarity.cosineTopK(spark, sf("sf0.001"), k = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.filter(_._6 == 1L).foreach { case (q, _, _, _, cos, _) =>
      assert(cos <= best(q), s"query $q: hard negative beats unrestricted top-1")
    }
  }

  test("rrf fusion scores recompute from the emitted ranks") {
    val rows = graft.text.Retrieval.rrfFusion(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3)))
    assert(rows.nonEmpty)
    def contrib(rank: Option[Long]): Long = rank.map(r => 1000000000L / (60L + r)).getOrElse(0L)
    rows.foreach { case (d, lr, vr, s) =>
      assert(lr.nonEmpty || vr.nonEmpty, s"doc $d in neither arm")
      assert(s == contrib(lr) + contrib(vr), s"doc $d score")
    }
    // each arm's ranks are 1..n with no gaps
    for (arm <- Seq(rows.flatMap(_._2), rows.flatMap(_._3)))
      assert(arm.sorted.toSeq == (1L to arm.length).toSeq)
    // output is ordered by fused score desc
    val scores = rows.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
