package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics2, Tables}
import graft.sim.GraphOps
import graft.text.Classify

/** Semantic invariants of the second analytics batch (CUSUM, lag-1
  * autocorrelation, co-purchase mining), the graph structure summaries,
  * and the in-query Naive Bayes quality classifier — properties the
  * hash oracle implies but which should fail loudly on their own. */
class Analytics2Spec extends SparkSpec {

  test("cusum: telescopes to zero at the last hour and flags every argmax") {
    val rows = Analytics2.cusumChangepoints(spark, sf("sf0.001"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("hour_start_s"))
      // Σ dev = Σ(sv·N − n·SV) = SV·N − N·SV = 0 — the cross-multiplied
      // deviation telescopes exactly; a scaled-mean residue would not
      assert(sorted.last.getAs[Long]("cusum") === 0L,
        s"$tpe: final CUSUM ${sorted.last.getAs[Long]("cusum")} != 0")
      val maxAbs = sorted.map(r => math.abs(r.getAs[Long]("cusum"))).max
      val flagged = sorted.filter(_.getAs[Boolean]("is_changepoint"))
      assert(flagged.nonEmpty, s"$tpe: no changepoint flagged")
      flagged.foreach(r => assert(math.abs(r.getAs[Long]("cusum")) === maxAbs))
      assert(sorted.count(r => math.abs(r.getAs[Long]("cusum")) === maxAbs)
        === flagged.length, s"$tpe: an argmax hour is unflagged")
    }
  }

  test("lag autocorr: replays exactly from a serial per-user walk") {
    val dir = sf("sf0.001")
    val got = Analytics2.lagAutocorr(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("lag1_corr"))).toMap
    // plain-Scala double entry: same quantization, same integer sums,
    // same IEEE expression — must be bit-identical
    val ev = Tables.t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3))
      s.zip(s.drop(1)).map { case (a, b) => (b._4, a._5, b._5) }
    }.toSeq
    val want = pairs.groupBy(_._1).map { case (tpe, ps) =>
      val n = ps.size.toLong
      val sx = ps.map(_._2).sum; val sy = ps.map(_._3).sum
      val sxx = ps.map(p => p._2 * p._2).sum
      val syy = ps.map(p => p._3 * p._3).sum
      val sxy = ps.map(p => p._2 * p._3).sum
      val corr = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(n * sxx.toDouble - sx.toDouble * sx.toDouble) *
          math.sqrt(n * syy.toDouble - sy.toDouble * sy.toDouble))
      tpe -> (n, corr)
    }
    assert(got === want)
  }

  test("copurchase: ranks are dense from 1, counts replay from the basket walk") {
    val dir = sf("sf0.001")
    val got = Analytics2.copurchaseTopk(spark, dir).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("rank"),
        r.getAs[Long]("p2"), r.getAs[Long]("n_orders")))
    assert(got.nonEmpty)
    got.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq)
    }
    // serial replay of the pair counts and the (n DESC, p2 ASC) top-3
    val li = Tables.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val counts = li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val und = counts.toSeq.flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
    val want = und.groupBy(_._1).flatMap { case (p1, es) =>
      es.sortBy(e => (-e._3, e._2)).take(3).zipWithIndex
        .map { case ((_, p2, n), i) => (p1, i + 1L, p2, n) }
    }.toSet
    assert(got.toSet === want)
  }

  test("copurchase lift: rules replay from the basket walk; bounds hold") {
    val dir = sf("sf0.001")
    val got = Analytics2.copurchaseLift(spark, dir).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("support_permille"), r.getAs[Long]("conf_permille"),
          r.getAs[Double]("lift"))).toMap
    got.values.foreach { case (nab, na, nb, sup, conf, lift) =>
      assert(nab >= 2L && nab <= na && nab <= nb)
      assert(conf <= 1000L && sup <= conf, "support cannot exceed confidence")
      assert(lift > 0.0)
    }
    val li = Tables.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1)
    val totalOrders = byOrder.size.toLong
    val items = li.groupBy(_._2).map { case (p, xs) => p -> xs.map(_._1).distinct.size.toLong }
    val pairCounts = byOrder.values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2L)
    val want = pairCounts.toSeq.flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
      .map { case (a, b, n) =>
        (a, b) -> (n, items(a), items(b), 1000L * n / totalOrders, 1000L * n / items(a),
          (totalOrders * n).toDouble / (items(a) * items(b)).toDouble)
      }.toMap
    assert(got === want)
  }

  test("category pmi: cells and marginals replay; pmi is the floored log ratio") {
    val dir = sf("sf0.001")
    val got = Analytics2.categoryPmi(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_l"), r.getAs[Long]("n_s"),
          r.getAs[Long]("pmi_bits"))).toMap
    assert(got.nonEmpty)
    val docs = Tables.t(spark, dir, "documents")
      .select("lang", "source").collect().map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nl = docs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val ns = docs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val nn = docs.length.toLong
    def bits(x: Long) = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val want = cells.map { case ((l, s), n) =>
      (l, s) -> (n, nl(l), ns(s), bits((n * nn * 1048576L) / (nl(l) * ns(s))) - 20L)
    }
    assert(got === want)
  }

  test("ks by type: replays exactly from a serial CDF walk") {
    val dir = sf("sf0.001")
    val got = Analytics2.ksByType(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_t"), r.getAs[Long]("d_cross"), r.getAs[Long]("d_permille"))).toMap
    val ev = Tables.t(spark, dir, "events")
      .select(col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("qv"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val grid = ev.map(_._2).distinct.sorted
    val nn = ev.length.toLong
    val byType = ev.groupBy(_._1)
    val want = byType.map { case (tpe, xs) =>
      val nt = xs.length.toLong
      val cellsT = xs.groupBy(_._2).map { case (v, ys) => v -> ys.length.toLong }
      val cellsAll = ev.groupBy(_._2).map { case (v, ys) => v -> ys.length.toLong }
      var ct = 0L; var ca = 0L; var d = 0L
      grid.foreach { v =>
        ct += cellsT.getOrElse(v, 0L); ca += cellsAll(v)
        d = math.max(d, math.abs(ct * nn - ca * nt))
      }
      tpe -> (nt, d, 1000L * d / (nt * nn))
    }
    assert(got === want)
    // D must be 0 iff the type IS the whole corpus; here every type is a
    // strict subset, so every D is positive
    got.values.foreach { case (_, d, _) => assert(d > 0L) }
  }

  test("jaccard neighbors: replays exactly from a serial wedge walk") {
    val dir = sf("sf0.001")
    val got = graft.sim.GraphOps.jaccardNeighbors(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("n_common"),
        r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b"), r.getAs[Long]("j_permille")))
    assert(got.nonEmpty && got.length <= 50)
    val pairs = Tables.t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val edges = pairs.flatMap { case (p, s) => Seq((p, s), (s, p)) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val mids = deg.filter(_._2 <= 32L).keySet
    val byMid = edges.filter(e => mids(e._1)).groupBy(_._1)
    val wedges = byMid.values.flatMap { es =>
      val ns = es.map(_._2).sorted
      for (i <- ns.indices; j <- (i + 1) until ns.length) yield (ns(i), ns(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val scored = wedges.map { case ((a, b), n) =>
      (a, b, n, deg(a), deg(b), 1000L * n / (deg(a) + deg(b) - n))
    }.toSeq
    val want = scored.sortBy(t => (-t._6, t._1, t._2)).take(50)
    assert(got.toSeq === want)
  }

  test("degree histogram: node and edge totals tie out to the distinct pair set") {
    val dir = sf("sf0.001")
    val h = GraphOps.degreeHistogram(spark, dir).collect()
    val pairs = Tables.t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
    val nPairs = pairs.count()
    val nParts = pairs.select("l_partkey").distinct().count()
    val nSupps = pairs.select("l_suppkey").distinct().count()
    val bySide = h.groupBy(_.getAs[String]("side"))
    assert(bySide("part").map(_.getAs[Long]("n_nodes")).sum === nParts)
    assert(bySide("supplier").map(_.getAs[Long]("n_nodes")).sum === nSupps)
    // each side's Σ deg·n_nodes is the full undirected pair count
    Seq("part", "supplier").foreach { s =>
      val degSum = bySide(s).map(r => r.getAs[Long]("deg") * r.getAs[Long]("n_nodes")).sum
      assert(degSum === nPairs, s"$s: Σ deg·n = $degSum != $nPairs")
    }
  }

  test("assortativity: symmetric edge list forces sx = sy; r is in [-1, 1]") {
    val r = GraphOps.assortativity(spark, sf("sf0.001")).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("sxl") === row.getAs[Long]("syl"),
      "directed-both-ways edges must have identical endpoint-degree sums")
    val a = row.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0, s"assortativity $a out of range")
    val pairs = Tables.t(spark, sf("sf0.001"), "lineitem")
      .select("l_partkey", "l_suppkey").distinct().count()
    assert(row.getAs[Long]("n_edges") === 2 * pairs)
  }

  test("nb quality: margin sign drives pred; confusion is the scorer's own rollup") {
    val dir = sf("sf0.001")
    val scored = Classify.nbQuality(spark, dir).collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      assert(Set("good", "bad")(r.getAs[String]("label")))
      assert(Set("train", "val", "test")(r.getAs[String]("split")))
      assert(r.getAs[Long]("n_scored_tokens") >= 1L)
      val m = r.getAs[Long]("margin_bits")
      assert(r.getAs[String]("pred") === (if (m > 0) "good" else "bad"))
    }
    // double entry between the two queries: the confusion report must
    // equal a plain rollup of the scorer's held-out rows
    val want = scored.filter(_.getAs[String]("split") != "train")
      .groupBy(r => (r.getAs[String]("split"), r.getAs[String]("label"),
        r.getAs[String]("pred")))
      .map { case (k, rs) => k -> (rs.length.toLong,
        rs.map(_.getAs[Long]("n_scored_tokens")).sum,
        rs.map(_.getAs[Long]("margin_bits")).sum) }
    val got = Classify.nbConfusion(spark, dir).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[String]("label"),
        r.getAs[String]("pred")) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_margin"))).toMap
    assert(got === want)
  }

  test("quality sweep is the scorer's own retention rollup; retention is monotone in tau") {
    val dir = sf("sf0.001")
    val scored = Classify.nbQuality(spark, dir).collect()
      .map(r => (r.getAs[String]("label"), r.getAs[Long]("n_scored_tokens"),
        r.getAs[Long]("margin_bits")))
    val totalDocs = scored.length.toLong
    val totalToks = scored.map(_._2).sum
    val taus = Seq(-2000L, -1000L, -500L, -200L, -100L, 0L, 100L, 200L, 500L, 1000L, 2000L)
    val want = taus.flatMap { tau =>
      val kept = scored.filter { case (_, n, m) => m * 1000L >= tau * n }
      if (kept.isEmpty) None else Some(tau -> (kept.length.toLong,
        kept.map(_._2).sum, kept.count(_._1 == "good").toLong,
        1000L * kept.length / totalDocs, 1000L * kept.map(_._2).sum / totalToks))
    }.toMap
    val got = Classify.qualitySweep(spark, dir).collect()
      .map(r => r.getAs[Long]("tau_mbits") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_good"),
        r.getAs[Long]("doc_permille"), r.getAs[Long]("token_permille"))).toMap
    assert(got === want)
    // a stricter threshold can only shrink the surviving set
    val docs = taus.flatMap(got.get(_).map(_._1))
    assert(docs === docs.sorted.reverse, s"retention not monotone: $docs")
    // tau = -2000 milli-bits/token is below any per-token margin here: keeps all
    assert(got(-2000L)._1 === totalDocs)
  }

  test("seasonal profile: deviations telescope to zero; every argmax hod is peaked") {
    val byType = Analytics2.seasonalProfile(spark, sf("sf0.001")).collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(byType.nonEmpty)
    byType.foreach { case (tpe, rs) =>
      assert(rs.forall(r => (0L until 24L).contains(r.getAs[Long]("hod"))))
      // Σ_h (sv_h·N − n_h·SV) = SV·N − N·SV = 0 exactly
      assert(rs.map(_.getAs[Long]("dev")).sum === 0L, s"$tpe: Σ dev != 0")
      val maxDev = rs.map(_.getAs[Long]("dev")).max
      val peaks = rs.filter(_.getAs[Boolean]("is_peak"))
      assert(peaks.nonEmpty && peaks.forall(_.getAs[Long]("dev") === maxDev))
      assert(rs.count(_.getAs[Long]("dev") === maxDev) === peaks.length)
    }
  }

  test("interarrival burstiness: replays exactly from a serial per-user walk") {
    val dir = sf("sf0.001")
    val got = Analytics2.interarrivalBurstiness(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Long]("sum_gap_s"),
          r.getAs[Double]("burstiness"))).toMap
    val ev = Tables.t(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gaps = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3))
      s.zip(s.drop(1)).map { case (a, b) => (b._4, (b._2 - a._2) / 1000000000L) }
    }.toSeq
    val want = gaps.groupBy(_._1).map { case (tpe, gs) =>
      val n = gs.size.toLong
      val sg = gs.map(_._2).sum; val sgg = gs.map(g => g._2 * g._2).sum
      val sd = math.sqrt(n * sgg.toDouble - sg.toDouble * sg.toDouble)
      tpe -> (n, sg, (sd - sg.toDouble) / (sd + sg.toDouble))
    }
    assert(got === want)
  }

  test("bigram perplexity: transition count ties out to token count minus one") {
    val dir = sf("sf0.001")
    val bp = Classify.bigramPerplexity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("h2_mbits"))).toMap
    assert(bp.nonEmpty)
    bp.values.foreach { case (n, h) => assert(n >= 1L && h >= 0L) }
    // cross-query double entry: n_bigrams = n_tokens − 1 for every doc
    // with ≥ 2 tokens, and exactly those docs appear
    val tc = graft.text.TextAnalysis.tokenCounts(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    val wantDocs = tc.filter(_._2 >= 2)
    assert(bp.keySet === wantDocs.keySet)
    wantDocs.foreach { case (d, nt) => assert(bp(d)._1 === nt - 1, s"doc $d") }
  }

  test("nb calibration: bins roll up the scorer; good rate is monotone-ish evidence") {
    val dir = sf("sf0.001")
    val scored = Classify.nbQuality(spark, dir).collect()
    val want = scored.groupBy(r => (r.getAs[String]("split"),
      math.floor(r.getAs[Long]("margin_bits").toDouble / 256.0).toLong))
      .map { case (k, rs) => k -> (rs.length.toLong,
        rs.count(_.getAs[String]("label") == "good").toLong) }
    val got = Classify.nbCalibration(spark, dir).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("margin_bin")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_good"))).toMap
    assert(got === want)
    got.foreach { case (_, (n, g)) => assert(g >= 0L && g <= n) }
    // the top bin must be purer than the bottom bin in every split —
    // the weakest useful statement of calibration, and it holds because
    // the margin is literally built from the label's evidence
    got.keys.map(_._1).toSeq.distinct.foreach { split =>
      val bins = got.filter(_._1._1 == split).toSeq
        .map { case ((_, b), (n, g)) => (b, 1000L * g / n) }.sortBy(_._1)
      assert(bins.last._2 >= bins.head._2, s"$split: top bin less pure than bottom")
    }
  }

  /** Quantized embeddings at sf0.001, the shared input of the PCA-family
    * replays. */
  private def quantizedEmb(dir: String): Array[Array[Long]] =
    Tables.t(spark, dir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 10000d + 0.5d).toLong).toArray)

  /** Plain-Scala integer replay of Pca's moments → rescale → 3 power
    * rounds (same shifted integral divisions). */
  private def replayPcaV(emb: Array[Array[Long]]): Array[Long] = {
    val n = emb.length.toLong
    val d = 64
    val sij = Array.ofDim[Long](d, d); val si = new Array[Long](d)
    emb.foreach { q =>
      var i = 0
      while (i < d) {
        si(i) += q(i); var j = 0
        while (j < d) { sij(i)(j) += q(i) * q(j); j += 1 }; i += 1
      }
    }
    val c0 = Array.tabulate(d, d)((i, j) => n * sij(i)(j) - si(i) * si(j))
    val m = c0.flatten.map(math.abs).max
    val s = 1000000L
    val cs = c0.map(_.map(x => ((BigInt(x) + m) * s / m - s).toLong))
    var v = Array.fill(d)(s)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cs(i)(j) * v(j)).sum)
      val mw = w.map(math.abs).max
      v = w.map(x => ((BigInt(x) + mw) * s / mw - s).toLong)
    }
    v
  }

  test("pca power: replays exactly from a plain-Scala integer iteration") {
    val dir = sf("sf0.001")
    val got = graft.sim.Pca.pcaPower(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("v")).toMap
    assert(got.size === 64)
    // renormalization pins the max-|component| at exactly S
    assert(got.values.map(math.abs).max === 1000000L)
    val v = replayPcaV(quantizedEmb(dir))
    val want = v.zipWithIndex.map { case (x, i) => i.toLong -> x }.toMap
    assert(got === want)
  }

  test("anisotropy report: replays exactly, residual rescale included") {
    val dir = sf("sf0.001")
    val r = graft.sim.Pca.anisotropyReport(spark, dir).collect()
    assert(r.length === 1)
    val row = r(0)
    val emb = quantizedEmb(dir)
    val v = replayPcaV(emb)
    val s = 1000000L
    val vv = v.map(x => x * x).sum
    val resid = emb.map { x =>
      val p = x.zip(v).map { case (a, b) => a * b }.sum
      val ri = x.zip(v).map { case (xi, vi) => xi * vv - p * vi }
      val mr = ri.map(math.abs).max
      if (mr == 0L) ri.map(_ => 0L)
      else ri.map(x0 => ((BigInt(x0) + mr) * s / mr - s).toLong)
    }
    def meanQcos(vecs: Array[Array[Long]]): (Long, Long) = {
      val cent = vecs.transpose.map(_.sum)
      val ns = cent.map(x => BigInt(x) * x).sum
      val qs = vecs.flatMap { x =>
        val nx = x.map(a => BigInt(a) * a).sum
        if (nx == 0) None
        else {
          val dot = x.zip(cent).map { case (a, b) => BigInt(a) * b }.sum
          Some(math.floor((dot.toDouble
            / (math.sqrt(nx.toDouble) * math.sqrt(ns.toDouble)) + 1.0) * 1000000d).toLong)
        }
      }
      (qs.length.toLong, qs.sum / qs.length)
    }
    val (nb, mb) = meanQcos(emb)
    val (na, ma) = meanQcos(resid)
    assert(row.getAs[Long]("n_before") === nb)
    assert(row.getAs[Long]("mean_qcos_before") === mb)
    assert(row.getAs[Long]("n_after") === na)
    assert(row.getAs[Long]("mean_qcos_after") === ma)
  }

  test("pca explained: leading share dominates the 1/64 uniform floor") {
    val r = graft.sim.Pca.pcaExplained(spark, sf("sf0.001")).collect()
    assert(r.length === 1)
    val share = r(0).getAs[Double]("explained_share")
    val lambda = r(0).getAs[Double]("lambda_scaled")
    assert(lambda > 0.0, s"Rayleigh quotient $lambda must be positive")
    // ≤1 up to the ±1-per-cell rescale rounding of the PSD matrix
    assert(share > 1.0 / 64 && share <= 1.0 + 1e-4,
      s"explained share $share outside (1/64, 1]")
  }

  test("zipf fit: slope is negative, self-consistent with its own sums") {
    val r = Classify.zipfFit(spark, sf("sf0.001")).collect()
    assert(r.length === 1)
    val row = r(0)
    val (n, sx, sy, sxy, slope) = (row.getAs[Long]("n_terms"),
      row.getAs[Long]("sx"), row.getAs[Long]("sy"), row.getAs[Long]("sxy"),
      row.getAs[Double]("slope_bits"))
    assert(n >= 10L && n <= 1000L) // sf0.001's synthetic vocab is ~31 terms
    assert(slope < 0.0, s"Zipf slope must be negative, got $slope")
    assert(slope > -3.0, s"slope $slope implausibly steep")
    // serial replay: same tokenizer, same (f DESC, term) top-1000, same
    // quarter/half-bit quantized logs, same slope tree
    val counts = Tables.t(spark, sf("sf0.001"), "documents")
      .select("text").collect().iterator
      .flatMap(_.getString(0).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .foldLeft(Map.empty[String, Long]) { (m, t) => m.updated(t, m.getOrElse(t, 0L) + 1L) }
    val top = counts.toSeq.sortBy { case (t, f) => (-f, t) }.take(1000)
    def bits(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val pts = top.zipWithIndex.map { case ((_, f), i) =>
      val r = i + 1L
      (bits(r * r * r * r).toLong, bits(f * f).toLong)
    }
    val (wn, wsx, wsy) = (pts.size.toLong, pts.map(_._1).sum, pts.map(_._2).sum)
    val wsxx = pts.map(p => p._1 * p._1).sum
    val wsxy = pts.map(p => p._1 * p._2).sum
    assert((n, sx, sy, sxy) === ((wn, wsx, wsy, wsxy)))
    val wslope = 2.0 * (wn * wsxy.toDouble - wsx.toDouble * wsy.toDouble) /
      (wn * wsxx.toDouble - wsx.toDouble * wsx.toDouble)
    assert(slope === wslope)
  }

  test("label centroids: full pair set, exact replay from a serial centroid walk") {
    val dir = sf("sf0.001")
    val got = graft.sim.Embeddings.labelCentroids(spark, dir).collect()
      .map(r => (r.getAs[Long]("la"), r.getAs[Long]("lb")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("dot"),
          r.getAs[Double]("cos"))).toMap
    val emb = Tables.t(spark, dir, "embeddings")
      .select("label", "embedding").collect()
      .map(r => r.getInt(0).toLong ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000d + 0.5d).toLong).toArray)
    val byLabel = emb.groupBy(_._1)
    val cent = byLabel.map { case (l, vs) =>
      l -> (vs.size.toLong, vs.map(_._2).transpose.map(_.sum).toArray)
    }
    val labels = cent.keys.toSeq.sorted
    val want = (for {
      a <- labels; b <- labels if a < b
      (na, sa) = cent(a); (nb, sb) = cent(b)
      dot = sa.zip(sb).map { case (x, y) => x * y }.sum
      nsqa = sa.map(x => x * x).sum; nsqb = sb.map(x => x * x).sum
    } yield (a, b) -> (na, nb, dot,
      dot.toDouble / (math.sqrt(nsqa.toDouble) * math.sqrt(nsqb.toDouble)))).toMap
    assert(got === want)
    got.values.foreach { case (_, _, _, c) => assert(c >= -1.0 && c <= 1.0) }
  }

  test("nb quality: the model separates the label it was trained against") {
    // not a tautology: the NB weights see only train-split term counts,
    // yet must beat coin-flip on the held-out label by a wide margin
    // (the label's evidence — stopword mass — is in the vocabulary)
    val held = Classify.nbConfusion(spark, sf("sf0.001")).collect()
    val n = held.map(_.getAs[Long]("n_docs")).sum
    val hit = held.filter(r => r.getAs[String]("label") === r.getAs[String]("pred"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(n > 0)
    assert(hit * 10 >= n * 7, s"held-out accuracy $hit/$n below 0.7")
  }
}
