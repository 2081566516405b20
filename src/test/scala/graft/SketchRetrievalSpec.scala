package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sketches, TpchMore}
import graft.text.Retrieval
import graft.sim.{Embeddings, GraphOps}

/** Properties of the round-4 operators that the DuckDB hash-compare
  * can't express: sketch error bounds, the bloom no-false-negative
  * guarantee, PageRank mass conservation, and quantization range
  * invariants. */
class SketchRetrievalSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("bloom filter never drops a true match (no false negatives)") {
    val row = Sketches.bloomPrune(spark, dir).collect()(0)
    val exact = {
      val c = graft.operators.Tables.t(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      graft.operators.Tables.t(spark, dir, "orders")
        .join(c, col("o_custkey") === col("c_custkey")).count()
    }
    assert(row.getAs[Long]("n_true_match") === exact,
      "every order whose custkey is in the build side must survive the bloom")
    assert(row.getAs[Long]("n_false_pos") >= 0L)
    assert(row.getAs[Long]("n_bloom_pass") <= row.getAs[Long]("n_probe"))
  }

  test("HLL estimate is within the 3-sigma bound for m=256") {
    val row = Sketches.hllDistinct(spark, dir).collect()(0)
    val exact = row.getAs[Long]("n_exact").toDouble
    val est = row.getAs[Double]("hll_est")
    // standard error 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(est - exact) / exact < 0.195,
      s"est $est vs exact $exact drifted past 3 sigma")
  }

  test("grouped HLL keeps every group's relative error inside the raw-estimator band") {
    // sf0.01, where n/m ≈ 5 per group: below that (sf0.001 has n < m)
    // the raw estimator is in its documented small-range regime and
    // only linear counting would rescue it — out of scope (hllDistinct
    // scaladoc). 0.3 bounds bias + 3-sigma variance and still catches
    // a broken register build (orders of magnitude off).
    Sketches.hllGroups(spark, sf("sf0.01")).collect().foreach { r =>
      val err = math.abs(r.getAs[Double]("rel_err"))
      assert(err < 0.3, s"group ${r.getAs[String]("g")} rel_err $err")
    }
  }

  test("bottom-k returns exactly k rows per stratum, ranked by hash") {
    val rows = Sketches.bottomK(spark, dir, k = 5).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    bySeg.foreach { case (_, rs) =>
      assert(rs.length === 5)
      val hs = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("h"))
      assert(hs.sameElements(hs.sorted), "rn order must be hash order")
    }
  }

  test("stratified sample is a subset with a plausible rate") {
    Sketches.stratifiedSample(spark, dir).collect().foreach { r =>
      val pop = r.getAs[Long]("population")
      val n = r.getAs[Long]("n_sample")
      assert(n <= pop)
      assert(r.getAs[Double]("rate") === n.toDouble / pop)
    }
  }

  test("Neyman allocation replays exactly: quotas ∝ n_s·σ_s, selection is bottom-quota by hash") {
    val budget = 1000
    // plain-Scala double entry of the whole allocation + selection
    val ev = graft.operators.Tables.t(spark, dir, "events")
      .select("event_type", "event_id", "value").collect()
      .map { r =>
        val v = new java.math.BigDecimal(r.getAs[Double]("value"))
          .setScale(2, java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact
        (r.getAs[String]("event_type"), r.getAs[Long]("event_id"), v)
      }
    def h(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"ney_$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000007L
    }
    val strata = ev.groupBy(_._1).map { case (et, rs) =>
      val n = BigInt(rs.length)
      val sv = rs.map(r => BigInt(r._3)).sum
      val svv = rs.map(r => BigInt(r._3) * r._3).sum
      val wq = math.sqrt((n * svv - sv * sv).toDouble).toLong
      (et, (rs, wq))
    }
    val tw = strata.values.map(_._2).sum
    val expected = strata.map { case (et, (rs, wq)) =>
      val quota = (budget * wq) / tw
      val picked = rs.sortBy(r => (h(r._2), r._2)).take(quota.toInt).map(_._2).toSet
      et -> (rs.length.toLong, quota, picked)
    }

    val rows = Sketches.neymanSample(spark, dir, budget).collect()
    val byStratum = rows.groupBy(_.getAs[String]("event_type"))
    assert(byStratum.keySet === expected.filter(_._2._3.nonEmpty).keySet)
    byStratum.foreach { case (et, rs) =>
      val (nS, quota, picked) = expected(et)
      assert(rs.forall(_.getAs[Long]("n_s") == nS))
      assert(rs.forall(_.getAs[Long]("quota") == quota))
      assert(rs.length.toLong === math.min(quota, nS), s"stratum $et row count")
      assert(rs.map(_.getAs[Long]("event_id")).toSet === picked, s"stratum $et selection")
    }
    assert(expected.values.map(_._2).sum <= budget, "allocation never exceeds the budget")
  }

  test("tf-idf emits at most k rows per doc with non-increasing scores") {
    val rows = Retrieval.tfidfTop(spark, dir, k = 5).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val scores = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("bm25 scores are positive and bounded by the per-term idf sum") {
    val rows = Retrieval.bm25Rank(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Double]("score")
      assert(total > 0.0)
      val parts = Retrieval.bm25Terms.map(t => r.getAs[Double](s"s_$t"))
      assert(math.abs(parts.sum - total) < 1e-6)
      assert(parts.forall(_ >= 0.0))
    }
  }

  test("decontamination only reports test-split docs") {
    val testDocs = Retrieval.decontaminate(spark, dir)
      .collect().map(_.getAs[Long]("test_doc")).toSet
    val splits = graft.text.TextAnalysis.splitAssign(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(testDocs.forall(d => splits(d) != "train"))
  }

  test("pagerank conserves rank mass up to integer truncation") {
    // run with a topN past the node count to see the full distribution
    val ranks = GraphOps.pageRank(spark, dir, iters = 3, topN = 1000000)
      .collect().map(_.getAs[Long]("rank"))
    val total = ranks.sum
    val S = 1000000000000L
    // each DIV truncates < 1 unit per edge/node per round; 1% slack is generous
    assert(total <= S && total > (S * 0.99).toLong,
      s"rank mass $total escaped [0.99*S, S]")
  }

  test("int8 codes stay in [-127, 127] and hit the extreme for the max element") {
    val rows = Embeddings.int8Quantize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_q8") >= -127L)
      assert(r.getAs[Long]("max_q8") <= 127L)
      assert(math.max(math.abs(r.getAs[Long]("min_q8")), r.getAs[Long]("max_q8")) === 127L,
        "the max-abs element must map to +/-127")
    }
  }

  test("q18 orders all exceed the quantity floor") {
    val rows = TpchMore.largeOrders(spark, dir, minQty = 100).collect()
    assert(rows.forall(_.getAs[Double]("total_qty") > 100.0))
  }
}
