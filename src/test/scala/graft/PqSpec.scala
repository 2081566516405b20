package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sim.Pq

/** Double-entry checks for the product-quantization path: the codebooks,
  * codes and ADC distances the engine reports are recomputed here with
  * plain Scala arithmetic from the same collected model — a different
  * evaluation path than both Spark SQL and the DuckDB oracle. */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val M = 4
  private val sd = 16

  private def quantize(v: scala.collection.Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 10000d + 0.5d).toLong).toArray

  /** codebooks()(m)(pos) = centroid vector (length sd). */
  private def collectedCodebooks(): Array[Array[Array[Long]]] = {
    val row = Pq.codebooks(spark, dir).collect()(0)
    (0 until M).map { m =>
      row.getAs[scala.collection.Seq[Row]](s"cents$m")
        .map(_.getAs[scala.collection.Seq[Long]]("c").toArray).toArray
    }.toArray
  }

  private def l2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("every stored code is the true argmin of its subspace codebook") {
    val cbs = collectedCodebooks()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 32)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        quantize(r.getAs[scala.collection.Seq[Float]]("embedding"))).toMap
    val codes = Pq.encoded(spark, dir).filter(col("vec_id") < 32)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (0 until M).map(m => r.getAs[Int](s"code$m")).toArray).toMap
    assert(codes.nonEmpty)
    codes.foreach { case (id, cs) =>
      val q = emb(id)
      (0 until M).foreach { m =>
        val qm = q.slice(m * sd, (m + 1) * sd)
        val dists = cbs(m).map(cent => l2(qm, cent))
        val want = dists.indices.minBy(i => (dists(i), i))
        assert(cs(m) === want, s"vec $id subspace $m: stored ${cs(m)}, argmin $want")
      }
    }
  }

  test("reported ADC distances equal the sum of subspace quantization-cell distances") {
    val cbs = collectedCodebooks()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        quantize(r.getAs[scala.collection.Seq[Float]]("embedding"))).toMap
    val codes = Pq.encoded(spark, dir)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (0 until M).map(m => r.getAs[Int](s"code$m")).toArray).toMap
    val top = Pq.pqTopK(spark, dir).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val (qid, cid, adist) = (r.getAs[Long]("query_id"),
        r.getAs[Long]("cand_id"), r.getAs[Long]("adist"))
      val q = emb(qid)
      val want = (0 until M).map { m =>
        val qm = q.slice(m * sd, (m + 1) * sd)
        l2(qm, cbs(m)(codes(cid)(m)))
      }.sum
      assert(adist === want, s"query $qid cand $cid: adist $adist, recomputed $want")
    }
  }

  test("ivfpq candidates all come from the query's probed cells, with PQ-identical ADC sums") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    val (corpus, cent) = graft.sim.Clustering.train(s, dir)
    val cells = graft.sim.Clustering.assign(corpus, cent)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    // probed cells per query = the nprobe=2 L2-nearest centroids; derive
    // independently from the collected centroid model
    val cm = cent.collect().map { r =>
      r.getAs[Long]("cid") -> r.getAs[scala.collection.Seq[Long]]("c").toArray
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 8)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        quantize(r.getAs[scala.collection.Seq[Float]]("embedding"))).toMap
    val probes: Map[Long, Set[Long]] = emb.map { case (qid, q) =>
      qid -> cm.map { case (cid, c) => (l2(q, c), cid) }
        .sortBy(identity).take(2).map(_._2).toSet
    }
    val ivfpq = graft.sim.Pq.ivfPqTopK(s, dir).collect()
    assert(ivfpq.nonEmpty)
    val pqAll = graft.sim.Pq.pqTopK(s, dir, k = 1000000).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id")) ->
        r.getAs[Long]("adist")).toMap
    ivfpq.foreach { r =>
      val (qid, cid2, adist) = (r.getAs[Long]("query_id"),
        r.getAs[Long]("cand_id"), r.getAs[Long]("adist"))
      assert(probes(qid).contains(cells(cid2)),
        s"query $qid returned cand $cid2 from un-probed cell ${cells(cid2)}")
      assert(pqAll((qid, cid2)) === adist,
        s"ADC sum differs between the pure-PQ and IVF-PQ paths for ($qid,$cid2)")
    }
  }

  test("incremental encoding covers exactly the delta split with per-cell totals consistent") {
    import graft.text.TextAnalysis
    val deltaN = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(TextAnalysis.splitHash(col("vec_id")) >= 90).count()
    val rep = graft.sim.Pq.pqIncremental(spark, dir).collect()
    assert(rep.nonEmpty)
    // every subspace's histogram sums to the delta count (each delta
    // vector contributes exactly one code per subspace)
    val perM = rep.groupBy(_.getAs[Int]("m"))
      .view.mapValues(_.map(_.getAs[Long]("delta_n")).sum).toMap
    assert(perM.keySet === (0 until M).toSet)
    perM.foreach { case (m, n) => assert(n === deltaN, s"subspace $m: $n != $deltaN") }
    rep.foreach { r =>
      assert(r.getAs[Long]("code") >= 0L && r.getAs[Long]("code") < 8L)
      assert(r.getAs[Long]("delta_qerr") >= 0L)
    }
  }

  test("ivfadc: candidates come from probed cells; residual recall >= raw ivfpq recall") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    val (corpus, cent) = graft.sim.Clustering.train(s, dir)
    val cells = graft.sim.Clustering.assign(corpus, cent)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    val cm = cent.collect().map { r =>
      r.getAs[Long]("cid") -> r.getAs[scala.collection.Seq[Long]]("c").toArray
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 8)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        quantize(r.getAs[scala.collection.Seq[Float]]("embedding"))).toMap
    val probes: Map[Long, Set[Long]] = emb.map { case (qid, q) =>
      qid -> cm.map { case (cid, c) => (l2(q, c), cid) }
        .sortBy(identity).take(2).map(_._2).toSet
    }
    val adc = Pq.ivfAdcTopK(s, dir).collect()
    assert(adc.nonEmpty)
    adc.foreach { r =>
      val (qid, cid2) = (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))
      assert(probes(qid).contains(cells(cid2)),
        s"query $qid returned cand $cid2 from un-probed cell ${cells(cid2)}")
    }
    // the point of residual coding: at the identical (M, Ks, nprobe)
    // budget, IVFADC must not lose recall vs raw-code IVF-PQ (measured
    // 0.275 vs 0.250 at sf0.001, 0.325 vs 0.275 at sf0.01)
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.collect()
      rows.map(_.getAs[Double]("recall")).sum / rows.length
    }
    val res = meanRecall(Pq.ivfAdcRecall(s, dir))
    val raw = meanRecall(Pq.ivfPqRecall(s, dir))
    assert(res >= raw, s"residual recall $res < raw $raw at the same budget")
  }

  test("opq: the permutation matches a plain-Scala variance round-robin; recall report is sane") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => quantize(r.getAs[scala.collection.Seq[Float]]("embedding")))
    val n = emb.length.toLong
    // exact integer variance key per dim, ranked desc with dim tiebreak
    val ranked = (0 until 64).map { i =>
      val s = emb.map(_(i)).sum
      val ss = emb.map(x => x(i) * x(i)).sum
      (BigInt(n) * BigInt(ss) - BigInt(s) * BigInt(s), i + 1)
    }.zipWithIndex.map { case ((v, dim), _) => (v, dim) }
      .sortBy { case (v, dim) => (-v, dim) }.map(_._2)
    // variance rank r -> permuted position (r mod 4)*16 + r/4
    val want = Array.ofDim[Int](64)
    ranked.zipWithIndex.foreach { case (dim, r) => want((r % 4) * 16 + r / 4) = dim }
    val got = Pq.permRow(spark, dir).collect()(0)
      .getAs[scala.collection.Seq[Int]]("perm").toArray
    assert(got.toSeq === want.toSeq)
    assert(got.sorted.toSeq === (1 to 64), "must be a true permutation of 1..64")
    val rows = Pq.opqRecall(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq === (0L to 7L))
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("recall report: panel complete, k exact rows each, recall in [0,1] and above chance") {
    val rows = Pq.pqRecall(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq === (0L to 7L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 5L)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(rec === r.getAs[Long]("n_hits").toDouble / 5.0)
    }
  }
}
