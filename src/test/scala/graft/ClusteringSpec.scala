package graft

import org.apache.spark.sql.functions._
import graft.sim.Clustering

/** K-means / SemDeDup / cluster-balanced sampling semantics on the
  * harness data plus a synthetic well-separated corpus (the testdata
  * vectors are uniform random, so cluster RECOVERY needs planted
  * structure the same way near-dup detection does). */
class ClusteringSpec extends SparkSpec {

  test("kmeans partitions the corpus: sizes sum to n, inertia positive") {
    val rows = Clustering.kmeans(spark, sf("sf0.001")).collect()
    assert(rows.length <= 8 && rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum ==
      spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").count())
    assert(rows.forall(_.getLong(2) > 0)) // inertia: random corpus, never 0
  }

  test("cluster-balanced sample: <= k per cluster, rank-1 is the argmin") {
    val s = Clustering.clusterBalancedSample(spark, sf("sf0.001")).collect()
    val perCluster = s.groupBy(_.getLong(0))
    assert(perCluster.values.forall(_.length <= 3))
    perCluster.foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(byRank.sameElements(byRank.sorted)) // dist ascending with rank
    }
  }

  test("semdedup recovers exactly the planted pairs through the bucketed path") {
    val got = Clustering.semDedup(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val n = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").count()
    assert(got == (0L until 8L).map(i => (i, i + n)).toSet, got.toString)
  }

  test("semdedup candidate join is keyed on (cluster, band, bucket) — never all-pairs") {
    val df = Clustering.semDedup(spark, sf("sf0.001"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the verify-stage equi-join carries all three key columns (formatted
    // mode puts keys in the detail section's "Left keys" line)
    val keysLine = p.linesIterator.find(_.startsWith("Left keys"))
    assert(keysLine.nonEmpty, p.take(2000))
    assert(keysLine.get.contains("cid") && keysLine.get.contains("band") &&
      keysLine.get.contains("bucket"), keysLine.get)
  }

  test("incremental assignment covers exactly the delta split, consistently with full assignment") {
    import org.apache.spark.sql.functions._
    val inc = Clustering.kmeansIncremental(spark, sf("sf0.001")).collect()
    val deltaSize = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .filter(graft.text.TextAnalysis.splitHash(col("vec_id")) >= 90).count()
    assert(deltaSize > 0 && inc.map(_.getLong(1)).sum == deltaSize)
    // the delta's per-cluster counts can never exceed the full run's
    val full = Clustering.kmeans(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    inc.foreach(r => assert(r.getLong(1) <= full(r.getLong(0))))
  }

  test("trained IVF never invents cosines and respects per-query rank order") {
    val exact = graft.sim.Similarity.cosineTopK(spark, sf("sf0.001"), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Clustering.ivfTrainedTopK(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(ivf.nonEmpty)
    // scores are exact: any returned pair also in the exact top-50 agrees
    val drift = ivf.collect {
      case (q, c, cos, _) if exact.contains((q, c)) && exact((q, c)) != cos => (q, c)
    }
    assert(drift.isEmpty, s"cosine drift: $drift")
    ivf.groupBy(_._1).values.foreach { rs =>
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivf probe curve: budgets 1/2/4, recall monotone (wider nprobe supersets candidates)") {
    val rows = Clustering.ivfProbeCurve(spark, sf("sf0.001")).collect()
    assert(rows.map(_.getAs[Int]("budget")).toSeq === Seq(1, 2, 4))
    rows.foreach(r => assert(r.getAs[Long]("n_exact") === 40L)) // 8 queries × k=5
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    assert(recalls === recalls.sorted,
      s"nprobe b+1 probes a superset of b's cells, recall can't drop: $recalls")
    recalls.foreach(r => assert(r >= 0.0 && r <= 1.0))
    // measured shape on this corpus: a real curve, not a flat line
    assert(recalls.last > recalls.head,
      s"sf0.001 measured 0.85→0.975; a flat curve means the probe filter broke: $recalls")
  }

  test("kmeans clusters are pure on a separated synthetic corpus") {
    // 4 tight blobs of 25 vectors. The first-8-vectors seeding puts TWO
    // seeds inside each blob, so a blob may legitimately split between
    // its two seed centroids — but no trained cluster may ever MIX blobs
    // (inter-blob distance >> intra-blob spread).
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(64)(rnd.nextGaussian().toFloat * 5f))
    val vecs = (0 until 100).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_km").toString
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val assigned = Clustering.kmeans(spark, dir).collect()
    assert(assigned.map(_.getLong(1)).sum == 100)
    val membership = Clustering.clusterBalancedSample(spark, dir, perCluster = 100)
      .collect().map(r => (r.getLong(1), r.getLong(0))) // (vec_id, cid)
    assert(membership.length == 100)
    membership.groupBy(_._2).values.foreach { members =>
      val blobs = members.map(_._1 % 4).distinct
      assert(blobs.length == 1, s"cluster mixes blobs $blobs")
    }
  }

  test("k-center sample replays from a plain-Scala greedy walk") {
    val dir = sf("sf0.001")
    val got = Clustering.kCenterSample(spark, dir).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("min_d2")))
    val vecs = spark.read.parquet(dir + "/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000 + 0.5).toLong).toArray))
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var centers = Seq(0L)
    var want = Seq((1L, 0L, 0L))
    for (step <- 2L to 8L) {
      val (nid, nd) = vecs.keys.toSeq
        .map(v => (v, centers.map(c => d2(vecs(v), vecs(c))).min))
        .minBy { case (v, d) => (-d, v) }
      centers :+= nid
      want :+= ((step, nid, nd))
    }
    assert(got.toSeq === want)
    // the selection radius is non-increasing after the seed
    got.drop(1).map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _ =>
    }
  }
}
