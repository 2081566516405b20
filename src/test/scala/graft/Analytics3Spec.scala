package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics3, Tables}

/** Semantic invariants of the third analytics batch — plain-Scala
  * double-entry replays of each query's exact arithmetic, plus the
  * structural properties the hash oracle implies but which should fail
  * loudly on their own. */
class Analytics3Spec extends SparkSpec {

  test("benford: digits partition the table and replay from a serial count") {
    val dir = sf("sf0.001")
    val got = Analytics3.benfordDigits(spark, dir).collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n"),
        r.getAs[Long]("obs_permille"), r.getAs[Long]("exp_permille"),
        r.getAs[Long]("dev_permille")))
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    assert(got.forall(r => r._1 >= 1 && r._1 <= 9))
    // serial replay: same cents quantization, same string first digit
    val prices = Tables.t(spark, dir, "lineitem")
      .select((col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")).collect().map(_.getLong(0))
    val expConst = Map(1L -> 301L, 2L -> 176L, 3L -> 124L, 4L -> 96L,
      5L -> 79L, 6L -> 66L, 7L -> 57L, 8L -> 51L, 9L -> 45L)
    val counts = prices.groupBy(p => p.toString.head.asDigit.toLong)
      .map { case (d, ps) => d -> ps.length.toLong }
    val nn = prices.length.toLong
    assert(got.map(_._2).sum === nn) // digit cells partition the rows
    val want = counts.toSeq.sortBy(_._1).map { case (d, n) =>
      (d, n, 1000 * n / nn, expConst(d), 1000 * n / nn - expConst(d))
    }
    assert(got.toSeq === want)
  }

  test("streaks: histogram replays from a serial per-user day walk") {
    val dir = sf("sf0.001")
    val got = Analytics3.activityStreaks(spark, dir).collect()
      .map(r => r.getAs[Long]("max_streak") -> r.getAs[Long]("n_users")).toMap
    val days = Tables.t(spark, dir, "events")
      .select(col("user_id"), expr("ts DIV 86400000000000L").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val perUser = days.groupBy(_._1).map { case (_, ds) =>
      val sorted = ds.map(_._2).sorted
      // longest run of consecutive days
      var best = 1L; var cur = 1L
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        cur = if (b == a + 1) cur + 1 else 1L
        best = math.max(best, cur)
      }
      best
    }.toSeq
    val want = perUser.groupBy(identity).map { case (len, us) =>
      len -> us.size.toLong
    }
    assert(got === want)
    // user conservation: histogram sums to the distinct-user count
    assert(got.values.sum === days.map(_._1).distinct.length.toLong)
  }

  test("epoch shuffle: every epoch is a permutation; checksums replay serially") {
    val dir = sf("sf0.001")
    val got = Analytics3.epochShuffle(spark, dir).collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("xor_h"), r.getAs[Long]("order_sum")))
    val docIds = Tables.t(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    // conservation: each epoch's shards hold every document exactly once
    got.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._3).sum === docIds.length.toLong)
    }
    // serial replay of the shard assignment, membership XOR and
    // rank-weighted order checksum (identical md5-based hash)
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val want = (for {
      e <- 0L until 4L
      d <- docIds
    } yield {
      val h = h60(s"epshuf_${e}_$d")
      (e, h % 16, h, d)
    }).groupBy(t => (t._1, t._2)).map { case ((e, s), ms) =>
      val sorted = ms.sortBy(m => (m._3, m._4))
      val orderSum = sorted.zipWithIndex
        .map { case (m, i) => (i + 1L) * (m._3 % 997) }.sum
      (e, s, sorted.length.toLong, sorted.map(_._3).reduce(_ ^ _), orderSum)
    }.toSet
    assert(got.toSet === want)
  }

  test("bootstrap: ranks are a permutation and replicate moments replay") {
    val dir = sf("sf0.001")
    val got = Analytics3.bootstrapCi(spark, dir).collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("n_w"),
        r.getAs[Long]("sum_wv"), r.getAs[Long]("mean_micro"), r.getAs[Long]("rank")))
    assert(got.length === 32)
    assert(got.map(_._5).sorted.toSeq === (1L to 32L).toSeq)
    // rank order agrees with (mean, r) lexicographic order
    val byRank = got.sortBy(_._5).map(r => (r._4, r._1)).toSeq
    assert(byRank === byRank.sorted)
    // serial replay of two replicates' weighted moments
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val cdf = Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L)
    val ev = Tables.t(spark, dir, "events")
      .select(col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    Seq(0L, 17L).foreach { r =>
      val ws = ev.map { case (id, v) =>
        val u = h60(s"boot_${r}_$id") % 1000000L
        val w = cdf.indexWhere(u < _) match { case -1 => 6L; case k => k.toLong }
        (w, w * v)
      }
      val (nw, swv) = (ws.map(_._1).sum, ws.map(_._2).sum)
      val row = got.find(_._1 === r).get
      assert((row._2, row._3) === ((nw, swv)))
      assert(row._4 === 10000L * swv / nw)
    }
  }

  test("bfs layers: histogram replays from a serial multi-source BFS") {
    val dir = sf("sf0.001")
    val got = graft.sim.GraphOps.bfsLayers(spark, dir).collect()
      .map(r => r.getAs[Long]("dist") -> r.getAs[Long]("n_nodes")).toMap
    // serial BFS over the same part↔supplier edge list
    val pairs = Tables.t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val adj = (pairs.map(p => (p._1, p._2)) ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keySet
    var dist = nodes.filter(_ % 101 == 0).map(_ -> 0L).toMap
    (1 to 4).foreach { _ =>
      val next: Seq[(Long, Long)] = dist.toSeq.flatMap { case (n, d) =>
        adj(n).toSeq.map(_ -> (d + 1)) ++ Seq(n -> d)
      }
      dist = next.groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min }
    }
    val want = nodes.toSeq.map(n => dist.getOrElse(n, -1L))
      .groupBy(identity).map { case (d, ns) => d -> ns.size.toLong }
    assert(got === want)
    // conservation + parity sanity: all nodes are in exactly one layer
    assert(got.values.sum === nodes.size.toLong)
  }

  test("gini: deciles and coefficient replay from a serial sorted walk") {
    val dir = sf("sf0.001")
    val got = Analytics3.giniLorenz(spark, dir).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("lorenz_permille"),
        r.getAs[Long]("gini_milli")))
    assert(got.map(_._1).toSeq === (1L to 10L).toSeq)
    // Lorenz curve is monotone and ends at 1000 permille
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted)
    assert(got.last._2 === 1000L)
    // serial replay on the quantized values
    val qvs = Tables.t(spark, dir, "orders")
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 1000"))
      .collect().map(_.getLong(0)).sorted
    val nn = qvs.length.toLong
    val vv = qvs.sum
    val s = qvs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val giniMilli = (2 * s - (nn + 1) * vv) / ((nn * vv) / 1000)
    assert(got.head._3 === giniMilli)
    // cell-granular Lorenz probe: first VALUE CELL whose cumulative
    // count crosses k·N/10, reported with that whole cell's cum value
    // (matches the query's grid semantics; deciles can land mid-cell)
    val cells = qvs.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (qv, xs) => (qv, xs.length.toLong) }
    val cums = cells.scanLeft((0L, 0L)) { case ((cn, cv), (qv, c)) =>
      (cn + c, cv + c * qv)
    }.drop(1)
    (1 to 10).foreach { k =>
      val (_, cv) = cums.find { case (cn, _) => cn * 10 >= k * nn }.get
      assert(got(k - 1)._2 === 1000L * cv / vv, s"decile $k")
    }
  }

  test("rake: scores replay from a serial phrase segmentation") {
    val dir = sf("sf0.001")
    val got = Analytics3.keywordRake(spark, dir).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("freq"),
        r.getAs[Long]("degree"), r.getAs[Long]("score_milli")))
    assert(got.length === 25)
    // serial RAKE over the same tokenization
    val stop = Set("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "was", "for", "on", "with", "as", "by", "at", "it", "that", "this",
      "are", "be", "from", "we", "you", "not")
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val occ = docs.flatMap { case (_, text) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      // phrases = maximal stopword-free runs
      val phrases = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.newBuilder[String]
      toks.foreach { t =>
        if (stop(t)) { val p = cur.result(); if (p.nonEmpty) phrases += p; cur = List.newBuilder }
        else cur += t
      }
      val last = cur.result(); if (last.nonEmpty) phrases += last
      phrases.flatMap(p => p.map(w => (w, p.length.toLong)))
    }
    val want = occ.groupBy(_._1).map { case (w, os) =>
      val freq = os.length.toLong; val degree = os.map(_._2).sum
      (w, freq, degree, 1000L * degree / freq)
    }.toSeq.sortBy(t => (-t._4, t._1)).take(25)
    assert(got.toSeq === want)
  }

  test("kmv: estimate replays serially and the union-sketch identity holds") {
    val dir = sf("sf0.001")
    val k = 256
    val got = Analytics3.kmvJaccard(spark, dir).collect()
      .map(r => ((r.getAs[String]("t1"), r.getAs[String]("t2")),
        (r.getAs[Long]("k_used"), r.getAs[Long]("est_inter"),
          r.getAs[Long]("est_permille"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("n_inter"),
          r.getAs[Long]("exact_permille")))).toMap
    assert(got.nonEmpty)
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val tu = Tables.t(spark, dir, "events")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), h60(s"kmv_${r.getLong(1)}")))
      .distinct
    val byType = tu.groupBy(_._1).map { case (t, us) => t -> us.map(_._2).toSet }
    val types = byType.keys.toSeq.sorted
    for (i <- types.indices; j <- (i + 1) until types.length) {
      val (t1, t2) = (types(i), types(j))
      val (sa, sb) = (byType(t1), byType(t2))
      val ska = sa.toSeq.sorted.take(k).toSet
      val skb = sb.toSeq.sorted.take(k).toSet
      // union sketch of the two k-sketches == k-sketch of the union
      val unionSk = (ska ++ skb).toSeq.sorted.take(k)
      assert(unionSk === (sa ++ sb).toSeq.sorted.take(k))
      val estInter = unionSk.count(h => ska(h) && skb(h)).toLong
      val inter = (sa & sb).size.toLong
      val row = got((t1, t2))
      assert(row._1 === unionSk.length.toLong)
      assert(row._2 === estInter)
      assert(row._3 === 1000L * estInter / unionSk.length)
      assert((row._4, row._5, row._6) === ((sa.size.toLong, sb.size.toLong, inter)))
      assert(row._7 === 1000L * inter / (sa.size + sb.size - inter))
    }
  }

  test("random projection: histogram replays from a serial JL transform") {
    val dir = sf("sf0.001")
    val got = Analytics3.randomProjection(spark, dir).collect()
      .map(r => r.getAs[Long]("ratio_decile") -> r.getAs[Long]("n_pairs")).toMap
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val r = Array.tabulate(16, 64) { (j, i) =>
      h60(s"rp_${j + 1}_${i + 1}") % 6 match {
        case 0 => 1L; case 1 => -1L; case _ => 0L
      }
    }
    val vecs = Tables.t(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(row => (row.getLong(0),
        row.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000 + 0.5).toLong).toArray))
    val proj = vecs.map { case (id, q) =>
      (id, q, Array.tabulate(16)(j => (0 until 64).map(i => q(i) * r(j)(i)).sum))
    }
    val panel = proj.filter(_._1 < 8)
    val want = (for {
      (cid, cq, cy) <- proj
      (pid, pq, py) <- panel
      if cid != pid
      d2o = (0 until 64).map(i => (cq(i) - pq(i)) * (cq(i) - pq(i))).sum
      if d2o > 0
      d2p = (0 until 16).map(j => (cy(j) - py(j)) * (cy(j) - py(j))).sum
    } yield (1000L * 3 * d2p / (16 * d2o)) / 100)
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    assert(got === want)
    // distortion concentrates around ratio 1 (decile bucket ~10)
    val mass = got.filter { case (b, _) => b >= 5 && b <= 15 }.values.sum
    assert(mass * 10 >= got.values.sum * 8, s"JL mass too spread: $got")
  }

  test("ols: per-language fit replays from serial exact moments") {
    val dir = sf("sf0.001")
    val got = Analytics3.olsFit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"), r.getAs[Double]("slope"),
        r.getAs[Double]("intercept"), r.getAs[Double]("r2")))).toMap
    val rows = Tables.t(spark, dir, "documents")
      .select("lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1)),
        BigInt(r.getString(2).toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty))))
    val want = rows.groupBy(_._1).map { case (f, g) =>
      val n = BigInt(g.length)
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val syy = g.map(t => t._3 * t._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val slope = num / den
      f -> ((g.length.toLong, slope,
        (sy.toDouble - slope * sx.toDouble) / n.toDouble,
        num * num / (den * (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))))
    }
    assert(got === want)
    // tokens ≈ chars / avg-word-length: strongly positive fit everywhere
    got.values.foreach { case (_, slope, _, r2) =>
      assert(slope > 0 && r2 > 0.5, s"weak fit: $got")
    }
  }

  test("chi2: cells + total replay from a serial contingency table") {
    val dir = sf("sf0.001")
    val out = Analytics3.chi2Independence(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("observed"),
        r.getAs[Long]("expected_milli"), r.getAs[Long]("contrib_micro")))
    val (tot, cells) = out.partition(_._1 == "ZZ_TOTAL")
    val rows = Tables.t(spark, dir, "orders")
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.groupBy(identity).map { case (k, g) => k -> BigInt(g.length) }
    val ri = rows.groupBy(_._1).map { case (k, g) => k -> BigInt(g.length) }
    val cj = rows.groupBy(_._2).map { case (k, g) => k -> BigInt(g.length) }
    val nt = BigInt(rows.length)
    val want = n.toSeq.sortBy(k => (k._1._1, k._1._2)).map { case ((p, s), nij) =>
      val dev = nt * nij - ri(p) * cj(s)
      (p, s, nij.toLong, (ri(p) * cj(s) * 1000 / nt).toLong,
        (dev * dev * 1000000 / (nt * ri(p) * cj(s))).toLong)
    }
    assert(cells.toSeq === want)
    assert(tot.head._3 === want.length.toLong)
    assert(tot.head._4 === (ri.size - 1).toLong * (cj.size - 1)) // dof
    assert(tot.head._5 === want.map(_._5).sum)
  }

  test("concomp: histogram replays from a serial union-find (fixture converges in 4 rounds)") {
    val dir = sf("sf0.001")
    val got = graft.sim.GraphOps.connectedComponents(spark, dir).collect()
      .map(r => r.getAs[Long]("csize") -> r.getAs[Long]("n_components")).toMap
    val pairs = Tables.t(spark, dir, "lineitem")
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // serial union-find = TRUE components; equality proves the bounded
    // 4-round propagation converged on this fixture
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.toSeq.map(find).groupBy(identity)
      .values.map(_.size.toLong).groupBy(identity)
      .map { case (sz, g) => sz -> g.size.toLong }
    assert(got === want)
    assert(got.map { case (sz, n) => sz * n }.sum ===
      pairs.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
  }

  test("bitmap distinct: per-type counts equal plain distinct; words are the block count") {
    val dir = sf("sf0.001")
    val got = Analytics3.bitmapDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_distinct"), r.getAs[Long]("n_words")))).toMap
    val rows = Tables.t(spark, dir, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (t, g) =>
      val users = g.map(_._2).distinct
      t -> ((users.length.toLong, users.map(_ / 64).distinct.length.toLong))
    }
    assert(got === want)
  }

  test("snaive backtest: MAE/bias replay from a serial hourly walk") {
    val dir = sf("sf0.001")
    val got = Analytics3.backtestSnaive(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_hours"),
        r.getAs[Long]("mae_centi"), r.getAs[Long]("bias_sign")))).toMap
    val rows = Tables.t(spark, dir, "events")
      .select(col("event_type"), expr("ts div " + (3600L * 1000 * 1000 * 1000)).as("h"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hourly = rows.groupBy(r => (r._1, r._2))
      .map { case ((t, h), g) => (t, h) -> g.map(_._3).sum }
    val want = hourly.keys.groupBy(_._1).flatMap { case (t, ks) =>
      val errs = ks.toSeq.flatMap { case (_, h) =>
        hourly.get((t, h - 24)).map(p => p - hourly((t, h)))
      }
      if (errs.isEmpty) None
      else Some(t -> ((errs.length.toLong, errs.map(math.abs).sum / errs.length,
        errs.map(e => java.lang.Long.signum(e).toLong).sum)))
    }
    assert(got === want)
  }

  test("seasonal anomaly: per-cell anomaly counts replay serially") {
    val dir = sf("sf0.001")
    val got = Analytics3.seasonalAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("hod")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_anomalies"),
          r.getAs[Long]("anom_permille")))).toMap
    val rows = Tables.t(spark, dir, "events")
      .select(col("event_type"), (expr("ts div " + (3600L * 1000 * 1000 * 1000)) % 24).as("hod"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), BigInt(r.getLong(2))))
    val want = rows.groupBy(r => (r._1, r._2)).map { case (k, g) =>
      val n = BigInt(g.length)
      val s1 = g.map(_._3).sum; val s2 = g.map(r => r._3 * r._3).sum
      val anom = g.count { r =>
        val num = n * r._3 - s1
        num * num > 9 * (n * s2 - s1 * s1)
      }
      k -> ((g.length.toLong, anom.toLong, 1000L * anom / g.length))
    }
    assert(got === want)
    // cells partition the events
    assert(got.values.map(_._1).sum === rows.length.toLong)
  }

  test("ohlc: bars replay from a serial per-bar walk") {
    val dir = sf("sf0.001")
    val got = Analytics3.ohlcBars(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("h")) ->
        ((r.getAs[Long]("open_centi"), r.getAs[Long]("high_centi"),
          r.getAs[Long]("low_centi"), r.getAs[Long]("close_centi"),
          r.getAs[Long]("volume")))).toMap
    val hourNs = 3600L * 1000 * 1000 * 1000
    val rows = Tables.t(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = rows.groupBy(r => (r._1, r._2 / hourNs)).map { case (k, g) =>
      val ord = g.sortBy(r => (r._2, r._3))
      k -> ((ord.head._4, g.map(_._4).max, g.map(_._4).min, ord.last._4,
        g.length.toLong))
    }
    assert(got === want)
    // invariants: low <= open, close <= high
    got.values.foreach { case (o, h, l, c, _) =>
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("concomp doubling: 3 pointer-jump rounds reach the same components as plain and union-find") {
    val dir = sf("sf0.001")
    val plain = graft.sim.GraphOps.connectedComponents(spark, dir).collect()
      .map(r => r.getAs[Long]("csize") -> r.getAs[Long]("n_components")).toMap
    val dbl = graft.sim.GraphOps.connectedComponentsDoubling(spark, dir).collect()
      .map(r => r.getAs[Long]("csize") -> r.getAs[Long]("n_components")).toMap
    assert(dbl === plain) // both converged (plain is union-find-pinned above)
  }

  test("growth accounting: identities hold and statuses replay serially") {
    val dir = sf("sf0.001")
    val got = Analytics3.growthAccounting(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> ((r.getAs[Long]("active"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
        r.getAs[Long]("n_churned")))).toMap
    val dayNs = 86400L * 1000 * 1000 * 1000
    val days = Tables.t(spark, dir, "events")
      .select(col("user_id"), expr(s"ts DIV ${dayNs}L").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = days.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).sorted }
    val want = days.groupBy(_._2).map { case (d, g) =>
      val statuses = g.map { case (u, _) =>
        val ds = byUser(u)
        if (ds.head == d) "new"
        else if (ds.contains(d - 1)) "retained"
        else "resurrected"
      }
      val prevActive = days.count(_._2 == d - 1).toLong
      d -> ((g.length.toLong, statuses.count(_ == "new").toLong,
        statuses.count(_ == "retained").toLong,
        statuses.count(_ == "resurrected").toLong,
        prevActive - statuses.count(_ == "retained")))
    }
    assert(got === want)
    // identity: active = new + retained + resurrected, every day
    got.values.foreach { case (a, n, r, s, _) => assert(a === n + r + s) }
  }

  test("modularity: endpoint identities hold and every round replays from a serial walk") {
    val dir = sf("sf0.001")
    val got = Analytics3Spec.collectModularity(spark, dir)
    assert(got.map(_._1) === Seq(0L, 1L, 2L))
    // exact identities: q_den = M², q = q_num/q_den;
    // round 0 (singletons): q_num = −Σ d_v² (no intra edges)
    got.foreach { case (_, m, num, den, q) =>
      assert(den === m * m)
      assert(q === num.toDouble / den.toDouble)
    }
    assert(got.head._5 < 0.0)
    // this fixture is one connected component, so the converged
    // partition has Q = 0 EXACTLY (Σintra = M, Σd_c² = M²)
    assert(got(2)._3 === 0L)
    // serial replay of every round from the raw edge list
    val pairs = Tables.t(spark, dir, "lineitem")
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap(p => Seq(p, p.swap))
    val deg = edges.groupBy(_._1).map { case (n, g) => n -> BigInt(g.length) }
    var lab = edges.map(_._1).distinct.map(n => n -> n).toMap
    val mDir = BigInt(edges.length)
    val want = (0 to 2).map { r =>
      if (r > 0)
        lab = lab.map { case (n, l) =>
          n -> (edges.collect { case (s, d2) if d2 == n => lab(s) } :+ l).min
        }
      val intra = BigInt(edges.count { case (s, d2) => lab(s) == lab(d2) })
      val dsq = lab.groupBy(_._2).values
        .map(c => c.keys.iterator.map(deg).sum) // iterator: Set.map would dedup equal degrees
        .map(x => x * x).sum
      (r.toLong, mDir.toLong, (mDir * intra - dsq).toLong, (mDir * mDir).toLong)
    }
    assert(got.map(t => (t._1, t._2, t._3, t._4)) === want)
  }

  test("welch t-test: statistic and df replay from serial exact moments") {
    val dir = sf("sf0.001")
    val row = Analytics3.welchTtest(spark, dir).collect().head
    val rows = Tables.t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long")).collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
    def mom(t: String) = {
      val g = rows.filter(_._1 == t).map(_._2)
      (BigInt(g.length), g.sum, g.map(x => x * x).sum)
    }
    val (n1, sv1, svv1) = mom("click"); val (n2, sv2, svv2) = mom("purchase")
    def se2(n: BigInt, sv: BigInt, svv: BigInt) =
      (n.toDouble * svv.toDouble - sv.toDouble * sv.toDouble) /
        (n.toDouble * (n.toDouble - 1) * n.toDouble)
    val (a, b) = (se2(n1, sv1, svv1), se2(n2, sv2, svv2))
    val md = sv1.toDouble / n1.toDouble - sv2.toDouble / n2.toDouble
    assert(row.getAs[Long]("n1") === n1.toLong && row.getAs[Long]("n2") === n2.toLong)
    assert(row.getAs[Double]("t_stat") === md / math.sqrt(a + b))
    assert(row.getAs[Double]("welch_df") ===
      (a + b) * (a + b) / (a * a / (n1.toDouble - 1) + b * b / (n2.toDouble - 1)))
    // df bounded by the component dfs, as Welch-Satterthwaite promises
    val df = row.getAs[Double]("welch_df")
    assert(df >= math.min(n1.toDouble, n2.toDouble) - 1 && df <= n1.toDouble + n2.toDouble - 2)
  }

  test("vocab coverage: permilles replay from a serial top-k vocabulary") {
    val dir = sf("sf0.001")
    val got = Analytics3.vocabCoverage(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_covered"),
        r.getAs[Long]("coverage_permille")))).toMap
    val toks = Tables.t(spark, dir, "documents").select("lang", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("[^a-z0-9]+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val vocab = toks.groupBy(_._2).map { case (t, g) => (t, g.length) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(1000).map(_._1).toSet
    val want = toks.groupBy(_._1).map { case (l, g) =>
      val cov = g.count(t => vocab(t._2)).toLong
      l -> ((g.length.toLong, cov, 1000 * cov / g.length))
    }
    assert(got === want)
    // K=1000 covers most of each stream (a small language may hit 1000
    // exactly at sf0.001 — its whole vocabulary fits)
    got.values.foreach { case (_, _, p) => assert(p > 500 && p <= 1000) }
  }

  test("dp counts: noise replays from the integer inverse-CDF and has the geometric shape") {
    val dir = sf("sf0.001")
    val got = Analytics3.dpCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("day")) ->
        ((r.getAs[Long]("true_count"), r.getAs[Long]("noise"),
          r.getAs[Long]("released_count")))).toMap
    val widths = Seq(
      (0L, 21845L), (1L, 10922L), (-1L, 10922L), (2L, 5461L), (-2L, 5461L),
      (3L, 2730L), (-3L, 2730L), (4L, 1365L), (-4L, 1365L),
      (5L, 682L), (-5L, 682L), (6L, 341L), (-6L, 341L),
      (7L, 170L), (-7L, 170L), (8L, 85L), (-8L, 85L))
    def draw(t: String, d: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp_${t}_$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md.take(15), 16) % 65536
      var lower = 0L
      for ((k, w) <- widths) { if (u >= lower && u < lower + w) return k; lower += w }
      0L
    }
    got.foreach { case ((t, d), (tc, n, rc)) =>
      assert(n === draw(t, d), s"cell ($t,$d)")
      assert(rc === math.max(0L, tc + n))
      assert(n >= -8 && n <= 8)
    }
    // with many cells, about 1/3 of draws are zero and signs balance
    val ns = got.values.map(_._2).toSeq
    assert(ns.count(_ == 0L) * 5 > ns.size, s"too few zeros: ${ns.count(_ == 0L)}/${ns.size}")
    assert(math.abs(ns.sum) < ns.size, s"noise biased: ${ns.sum}")
  }

  test("abc analysis: classes replay from a serial Pareto walk") {
    val dir = sf("sf0.001")
    val got = Analytics3.abcAnalysis(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_parts"),
        r.getAs[Long]("revenue_cents"), r.getAs[Long]("share_permille")))).toMap
    val rev = Tables.t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long")).collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }.toSeq
    val tot = rev.map(_._2).sum
    var cum = 0L
    val classes = rev.sortBy { case (p, v) => (-v, p) }.map { case (_, v) =>
      cum += v
      if (cum * 1000 <= tot * 800) ("A", v)
      else if (cum * 1000 <= tot * 950) ("B", v) else ("C", v)
    }
    val want = classes.groupBy(_._1).map { case (c, g) =>
      c -> ((g.length.toLong, g.map(_._2).sum, 1000 * g.map(_._2).sum / tot))
    }
    assert(got === want)
    // the classes partition parts and revenue; A's share lands just
    // under the 800 threshold (this corpus is near-uniform, so A holds
    // MANY parts — the classifier is exact either way)
    assert(got.values.map(_._2).sum === tot)
    assert(got("A")._3 >= 750 && got("A")._3 <= 800)
  }

  test("auc: rank-sum AUC replays from a serial midrank walk and matches pair counting") {
    val dir = sf("sf0.001")
    val row = Analytics3.aucRank(spark, dir).collect().head
    val rows = Tables.t(spark, dir, "events")
      .select((col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long"), (col("event_type") === "purchase").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1) == 1L))
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    // direct pair counting: P(pos > neg) + P(tie)/2, doubled to stay integral
    val u2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
    assert(row.getAs[Long]("n_pos") === pos.length.toLong)
    assert(row.getAs[Long]("n_neg") === neg.length.toLong)
    assert(row.getAs[Long]("u2_num") === u2)
    assert(row.getAs[Long]("u2_den") === 2L * pos.length * neg.length)
    assert(row.getAs[Double]("auc") === u2.toDouble / (2L * pos.length * neg.length).toDouble)
  }

  test("mann-kendall: S and tie-corrected variance replay from a serial pair walk") {
    val dir = sf("sf0.001")
    val got = Analytics3.mannKendall(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_hours"), r.getAs[Long]("s_stat"),
        r.getAs[Long]("var18"), r.getAs[Double]("z")))).toMap
    val hourNs = 3600L * 1000 * 1000 * 1000
    val rows = Tables.t(spark, dir, "events")
      .select(col("event_type"), expr(s"ts div $hourNs").as("h"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long")).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (t, g) =>
      val series = g.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, xs) => xs.map(_._3).sum }
      val n = series.length.toLong
      val s = (for (i <- series.indices; j <- i + 1 until series.length)
        yield java.lang.Long.signum(series(j) - series(i)).toLong).sum
      val tie = series.groupBy(identity).values
        .map(ts => { val t0 = ts.size.toLong; t0 * (t0 - 1) * (2 * t0 + 5) }).sum
      val v18 = n * (n - 1) * (2 * n + 5) - tie
      val z = if (v18 > 0) (s.toDouble - math.signum(s.toDouble)) / math.sqrt(v18 / 18d)
        else 0d
      t -> ((n, s, v18, z))
    }
    assert(got === want)
  }

  test("hazard curve: at-risk accounting replays from a serial lifetime walk") {
    val dir = sf("sf0.001")
    val got = Analytics3.hazardCurve(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> ((r.getAs[Long]("at_risk"),
        r.getAs[Long]("n_churned"), r.getAs[Long]("hazard_permille")))).toMap
    val dayNs = 86400L * 1000 * 1000 * 1000
    val spans = Tables.t(spark, dir, "events")
      .select(col("user_id"), expr(s"ts DIV ${dayNs}L").as("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, g) => (u, g.map(_._2).min, g.map(_._2).max) }
    val days = (spans.map(_._2) ++ spans.map(_._3)).toSet
    val want = days.map { d =>
      val atRisk = spans.count(s => s._2 <= d && d <= s._3).toLong
      val churn = spans.count(_._3 == d).toLong
      d -> ((atRisk, churn, 1000 * churn / atRisk))
    }.toMap
    assert(got === want)
    // everyone at risk on day d-1 is either still at risk, churned, or
    // replaced by births: last day's at_risk equals its churn count
    val lastDay = got.keys.max
    assert(got(lastDay)._1 >= got(lastDay)._2)
  }

  test("id audit: per-table hygiene numbers replay serially") {
    val dir = sf("sf0.001")
    val got = Analytics3.idAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct"),
        r.getAs[Long]("n_dups"), r.getAs[Long]("n_gaps")))).toMap
    for ((tb, c) <- Seq(("events", "event_id"), ("orders", "o_orderkey"),
      ("customer", "c_custkey"), ("part", "p_partkey"), ("documents", "doc_id"))) {
      val ids = Tables.t(spark, dir, tb).select(col(c).cast("long")).collect()
        .map(_.getLong(0))
      val want = (ids.length.toLong, ids.distinct.length.toLong,
        (ids.length - ids.distinct.length).toLong,
        ids.max - ids.min + 1 - ids.distinct.length)
      assert(got(tb) === want, tb)
    }
  }

  test("null safety: three-valued logic counts replay serially") {
    val dir = sf("sf0.001")
    val row = Analytics3.nullSafety(spark, dir).collect().head
    val ln = Tables.t(spark, dir, "lineitem").select(col("l_linenumber").cast("long"))
      .collect().map(_.getLong(0))
    val v = ln.map(x => if (x % 3 == 0) None else Some(x % 3))
    assert(row.getAs[Long]("n_rows") === ln.length.toLong)
    assert(row.getAs[Long]("n_nonnull") === v.count(_.isDefined).toLong)
    assert(row.getAs[Long]("n_nullsafe_eq_null") === v.count(_.isEmpty).toLong)
    assert(row.getAs[Long]("n_nullsafe_eq_raw") === v.count(_.isDefined).toLong)
    assert(row.getAs[Long]("nvl2_weighted") ===
      v.map(o => if (o.isDefined) 10L else 1L).sum)
    assert(row.getAs[Long]("coalesce_sum") === v.map(_.getOrElse(-1L)).sum)
  }

  test("spearman: rho replays from a serial midrank computation") {
    val dir = sf("sf0.001")
    val row = Analytics3.spearmanCorr(spark, dir).collect().head
    val (n, rho) = (row.getAs[Long]("n"), row.getAs[Double]("spearman_rho"))
    val xs = Tables.t(spark, dir, "documents")
      .select("n_chars", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong))
    assert(n === xs.length.toLong)
    def mr2(vals: Seq[Long]): Map[Long, Long] = {
      val cells = vals.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (v, g) => (v, g.size.toLong) }
      cells.scanLeft((0L, 0L, 0L)) { case ((_, cum, _), (v, c)) =>
        (v, cum + c, 2 * cum + c + 1)
      }.drop(1).map { case (v, _, m) => v -> m }.toMap
    }
    val (mx, my) = (mr2(xs.map(_._1)), mr2(xs.map(_._2)))
    val rs = xs.map { case (x, y) => (BigInt(mx(x)), BigInt(my(y))) }
    val nn = BigInt(xs.length)
    val (sx, sy) = (rs.map(_._1).sum, rs.map(_._2).sum)
    val sxx = rs.map(p => p._1 * p._1).sum
    val syy = rs.map(p => p._2 * p._2).sum
    val sxy = rs.map(p => p._1 * p._2).sum
    val want = (nn.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (math.sqrt(nn.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        math.sqrt(nn.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    assert(rho === want)
    // char count and token count are strongly monotone-associated
    assert(rho > 0.9, s"rho=$rho")
  }
}

object Analytics3Spec {
  def collectModularity(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Seq[(Long, Long, Long, Long, Double)] =
    graft.sim.GraphOps.modularityCurve(spark, dir).collect().toSeq
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("m_dir"),
        r.getAs[Long]("q_num"), r.getAs[Long]("q_den"), r.getAs[Double]("q")))
}
