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

  test("hits: replays from a plain-Scala BigInt iteration") {
    val dir = sf("sf0.001")
    val got = Analytics4.hits(spark, dir).collect()
      .map(r => (r.getAs[String]("role"), r.getAs[Long]("node"),
        r.getAs[Long]("score")))
    val pairs = Tables.t(spark, dir, "lineitem")
      .select(col("l_suppkey").cast("long"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val S = BigInt(1000000000000L)
    def normalize(m: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = m.values.sum
      m.map { case (k, v) => k -> (S * v / tot) } // BigInt / floors (non-neg)
    }
    val suppliers = pairs.map(_._1)
    var hubs = suppliers.map(_ -> S / suppliers.size).toMap
    var auth = Map.empty[Long, BigInt]
    for (_ <- 1 to 2) {
      auth = normalize(pairs.toSeq.flatMap { case (s, p) =>
        hubs.get(s).map(p -> _)
      }.groupBy(_._1).map { case (p, vs) => p -> vs.map(_._2).sum })
      hubs = normalize(pairs.toSeq.flatMap { case (s, p) =>
        auth.get(p).map(s -> _)
      }.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sum })
    }
    def top(m: Map[Long, BigInt], role: String) =
      m.toSeq.sortBy { case (n, sc) => (-sc, n) }.take(20)
        .map { case (n, sc) => (role, n, sc.toLong) }
    val want = (top(auth, "authority") ++ top(hubs, "hub"))
      .sortBy { case (r, n, sc) => (r, -sc, n) }
    assert(got.toSeq === want)
    // sum normalization: each side's full score mass is ~S (floor loss only)
    assert(auth.values.sum <= S && auth.values.sum > S - auth.size)
  }

  test("cuped: theta minimizes adjusted variance and the identity holds") {
    val dir = sf("sf0.001")
    val rows = Analytics4.cuped(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("arm")).toSeq === Seq(0L, 1L))
    // pooled replay
    val u = Tables.t(spark, dir, "events")
      .select(col("user_id").cast("long"), expr("ts DIV 86400000000000").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (uid, es) =>
        (uid, es.count(_._2 < 19738L).toDouble, es.count(_._2 >= 19738L).toDouble)
      }.toSeq
    val n = u.size.toDouble
    val sx = u.map(_._2).sum; val sy = u.map(_._3).sum
    val sxx = u.map(v => v._2 * v._2).sum; val sxy = u.map(v => v._2 * v._3).sum
    val thetaWant = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rows.foreach { r =>
      val theta = r.getAs[Double]("theta")
      assert(math.abs(theta - thetaWant) < 1e-9 * math.max(1.0, math.abs(thetaWant)))
      val arm = r.getAs[Long]("arm")
      val au = u.filter(v => v._1 % 2 == arm)
      val an = au.size.toDouble
      assert(r.getAs[Long]("n_users") === au.size.toLong)
      def varOf(f: ((Long, Double, Double)) => Double): Double = {
        val s = au.map(f).sum; val ss = au.map(v => f(v) * f(v)).sum
        (an * ss - s * s) / (an * (an - 1.0))
      }
      // the reported var_cuped IS the variance of the adjusted metric
      val direct = varOf(v => v._3 - theta * v._2)
      assert(math.abs(r.getAs[Double]("var_cuped") - direct) < 1e-6 * math.max(1.0, direct))
    }
    // theta is the POOLED minimizer (it is fit pooled; a per-arm nudge
    // can go either way, the pooled adjusted variance cannot improve)
    def pooledVar(t: Double): Double = {
      val s = u.map(v => v._3 - t * v._2).sum
      val ss = u.map { v => val a = v._3 - t * v._2; a * a }.sum
      (n * ss - s * s) / (n * (n - 1.0))
    }
    for (d <- Seq(-0.05, 0.05)) {
      assert(pooledVar(thetaWant + d) >= pooledVar(thetaWant) - 1e-9)
    }
  }

  test("top paths: replays from a sorted plain-Scala walk") {
    val dir = sf("sf0.001")
    val got = Analytics4.topPaths(spark, dir).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"),
        r.getAs[Long]("n_users")))
    val evs = Tables.t(spark, dir, "events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("long"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = evs.groupBy(e => (e._1, e._3 / 86400000000000L)).toSeq
      .map { case ((uid, _), es) =>
        (uid, es.sortBy(e => (e._3, e._2)).take(4).map(_._4).mkString(">"))
      }
    val want = paths.groupBy(_._2).toSeq.map { case (p, ss) =>
      (p, ss.size.toLong, ss.map(_._1).distinct.size.toLong)
    }.sortBy { case (p, n, _) => (-n, p) }.take(20)
    assert(got.toSeq === want)
    // every path is 1..4 known event types
    val types = Set("click", "error", "purchase", "signup", "view")
    assert(got.forall(_._1.split(">").forall(types)))
  }

  test("srm: chi2 collapses to (n0-n1)^2/n and flags nothing on a fair split") {
    val dir = sf("sf0.001")
    val rows = Analytics4.srmCheck(spark, dir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val n0 = r.getAs[Long]("n_arm0"); val n1 = r.getAs[Long]("n_arm1")
      val d = n0 - n1
      assert(r.getAs[Long]("chi2_micro") === 1000000L * d * d / (n0 + n1))
      assert(r.getAs[Boolean]("srm_alert") ===
        (r.getAs[Long]("chi2_micro") >= 3841459L))
    }
    // the fixture's user_id % 2 split is fair: no cohort alerts
    assert(rows.forall(!_.getAs[Boolean]("srm_alert")))
  }

  test("closeness: replays from per-landmark plain-Scala BFS") {
    val dir = sf("sf0.001")
    val got = Analytics4.closeness(spark, dir).collect()
      .map(r => (r.getAs[Long]("suppkey"), r.getAs[Long]("n_reached"),
        r.getAs[Long]("sum_dist"), r.getAs[Long]("harmonic_milli")))
    val pairs = Tables.t(spark, dir, "lineitem")
      .select((col("l_partkey") * 2).cast("long"),
        (col("l_suppkey") * 2 + 1).cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val lms = adj.keySet.filter(_ % 2 == 1).toSeq.sorted.take(8)
    val want = lms.map { lm =>
      var dist = Map(lm -> 0L)
      var frontier = Set(lm)
      for (d <- 1L to 4L) {
        val next = frontier.flatMap(adj(_)).diff(dist.keySet)
        dist ++= next.map(_ -> d)
        frontier = next
      }
      val ds = dist.values.filter(_ > 0).toSeq
      ((lm - 1) / 2, ds.size.toLong, ds.sum, ds.map(1000L / _).sum)
    }
    assert(got.toSeq === want)
    assert(got.length === 8)
  }

  test("betweenness: replays from plain-Scala fixed-point Brandes on the panel") {
    val dir = sf("sf0.001")
    val got = Analytics4.betweenness(spark, dir).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("n_landmarks"),
        r.getAs[Long]("bc_milli")))
    val pairs = Tables.t(spark, dir, "lineitem")
      .select((col("l_partkey") * 2).cast("long"),
        (col("l_suppkey") * 2 + 1).cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val lms = adj.keySet.filter(_ % 2 == 1).toSeq.sorted.take(8)
    val acc = scala.collection.mutable.Map[Long, (Long, Long)]() // node -> (lms, Σδ)
    for (lm <- lms) {
      // forward BFS carrying shortest-path counts
      var dist = Map(lm -> 0L)
      val sigma = scala.collection.mutable.Map(lm -> 1L)
      var frontier = Seq(lm)
      for (d <- 1L to 4L) {
        val reached = scala.collection.mutable.Map[Long, Long]()
        for (u <- frontier; v <- adj(u) if !dist.contains(v))
          reached(v) = reached.getOrElse(v, 0L) + sigma(u)
        dist ++= reached.keys.map(_ -> d)
        reached.foreach { case (v, s) => sigma(v) = s }
        frontier = reached.keys.toSeq
      }
      // backward dependency accumulation, fixed-point Brandes rule
      val delta = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      val rows = scala.collection.mutable.Map[Long, Long]() // nodes that got a δ row
      for (r <- 3L to 1L by -1L) {
        val dr = scala.collection.mutable.Map[Long, Long]()
        for ((v, dv) <- dist if dv == r; w <- adj(v) if dist.get(w).contains(r + 1L))
          dr(v) = dr.getOrElse(v, 0L) + (sigma(v) * (1000L + delta(w))) / sigma(w)
        dr.foreach { case (v, x) => delta(v) = x; rows(v) = x }
      }
      rows.foreach { case (n, x) =>
        val (c, s) = acc.getOrElse(n, (0L, 0L)); acc(n) = (c + 1L, s + x)
      }
    }
    val want = acc.toSeq.collect { case (n, (c, s)) if s > 0 => (n, c, s) }
      .sortBy(x => (-x._3, x._1)).take(20)
    assert(got.toSeq === want)
    assert(got.nonEmpty)
  }

  test("power/MDE: sizing identity holds and zero-imputation covers the grid") {
    val dir = sf("sf0.001")
    val rows = Analytics4.powerMde(spark, dir).collect()
    assert(rows.length === 5)
    val nUsers = Tables.t(spark, dir, "events")
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") === nUsers) // grid, not just emitters
      val n = r.getAs[Long]("n_users").toDouble
      val varY = r.getAs[Double]("var_y")
      val meanY = r.getAs[Double]("mean_y")
      val mde = r.getAs[Double]("mde_abs")
      // mde identity: (z*sigma*sqrt(2/n))
      assert(math.abs(mde - 2.801585 * math.sqrt(varY) * math.sqrt(2.0 / n))
        < 1e-12 * math.max(1.0, mde))
      // sizing consistency: at n = n_required the MDE equals the 5% lift
      val nReq = r.getAs[Double]("n_required_per_arm")
      val mdeAtReq = 2.801585 * math.sqrt(varY) * math.sqrt(2.0 / nReq)
      assert(math.abs(mdeAtReq - 0.05 * meanY) < 1e-9 * math.max(1.0, meanY))
    }
  }

  test("delta merge equals the direct full-table aggregate, both sides non-empty") {
    val dir = sf("sf0.001")
    val got = Analytics4.deltaMerge(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val direct = Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("c"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)), sum("c"), min("c"), max("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === direct.toSeq)
    // the split actually has two non-empty sides (the merge is exercised)
    val sides = Tables.t(spark, dir, "orders")
      .select((col("o_orderdate") < lit("1998-01-01")).as("pre"))
      .groupBy("pre").count().collect()
    assert(sides.length === 2)
  }

  test("partition skew: bucket counts replay and the uniform fixture stays tame") {
    val dir = sf("sf0.001")
    val rows = Analytics4.partitionSkew(spark, dir).collect()
      .map(r => r.getAs[String]("shuffle_key") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_buckets"),
          r.getAs[Long]("max_bucket"), r.getAs[Long]("skew_permille"))).toMap
    assert(rows.size === 4)
    val nLineitem = Tables.t(spark, dir, "lineitem").count()
    assert(rows("lineitem.l_orderkey")._1 === nLineitem)
    rows.values.foreach { case (n, buckets, mx, skew) =>
      assert(buckets <= 1024L && buckets >= 1L)
      assert(mx * buckets >= n / 1024L * buckets) // max >= floor-avg
      assert(skew >= 1000L * buckets / 1024L)     // permille vs occupied share
    }
    // exact replay for events
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val evBuckets = Tables.t(spark, dir, "events")
      .select(col("user_id").cast("long")).collect().map(_.getLong(0))
      .groupBy(u => h60(u.toString) % 1024L).map(_._2.length.toLong)
    val (n, b, mx) = (evBuckets.sum, evBuckets.size.toLong, evBuckets.max)
    assert(rows("events.user_id") === ((n, b, mx, 1000L * mx * 1024L / n)))
  }

  test("anova F replays from plain-Scala group moments") {
    val dir = sf("sf0.001")
    val r = Analytics4.anovaF(spark, dir).collect()(0)
    val ys = Tables.t(spark, dir, "events")
      .select(col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1).toDouble))
    val groups = ys.groupBy(_._1).values.toSeq
    val n = ys.length.toDouble; val k = groups.size.toDouble
    val sqOverN = groups.map { g => val s = g.map(_._2).sum; s * s / g.size }.sum
    val ts = ys.map(_._2).sum; val tss = ys.map(v => v._2 * v._2).sum
    val ssb = sqOverN - ts * ts / n
    val ssw = tss - sqOverN
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(r.getAs[Long]("k_groups") === 5L)
    assert(r.getAs[Long]("n_rows") === ys.length.toLong)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-9 * math.max(1.0, f))
    val eta = ssb / (tss - ts * ts / n)
    assert(math.abs(r.getAs[Double]("eta_sq") - eta) < 1e-12)
    // uniform fixture: groups don't differ — F stays small, eta² tiny
    assert(r.getAs[Double]("eta_sq") < 0.01)
  }

  test("period-over-period: deltas replay from the weekly grid") {
    val dir = sf("sf0.001")
    val got = Analytics4.periodOverPeriod(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("week"),
        r.getAs[Long]("n_events"),
        Option(r.getAs[java.lang.Long]("prev_events")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("wow_permille")).map(_.toLong)))
    val weekly = Tables.t(spark, dir, "events")
      .select(col("event_type"), expr("ts DIV 604800000000000").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t0, w), es) => (t0, w, es.size.toLong) }
      .toSeq.sortBy(r => (r._1, r._2))
    val want = weekly.groupBy(_._1).toSeq.flatMap { case (_, ws) =>
      val sorted = ws.sortBy(_._2)
      sorted.zipWithIndex.map { case ((t0, w, c), i) =>
        val prev = if (i == 0) None else Some(sorted(i - 1)._3)
        (t0, w, c, prev, prev.map(p => 1000L * (c - p) / p))
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq === want)
    // first week per type carries NULLs
    assert(got.groupBy(_._1).values.forall(_.minBy(_._2)._4.isEmpty))
  }

  test("slo burn: alert hours replay from the hourly grid") {
    val dir = sf("sf0.001")
    val got = Analytics4.sloBurn(spark, dir).collect()
      .map(r => (r.getAs[Long]("win_start_hour"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_errors"), r.getAs[Long]("long_ppm"),
        r.getAs[Long]("max_short_ppm"), r.getAs[Long]("n_alert_hours")))
    val evs = Tables.t(spark, dir, "events")
      .select(expr("ts DIV 3600000000000").cast("long"),
        (col("event_type") === "error").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hourly = evs.groupBy(_._1).map { case (h, es) =>
      (h, es.size.toLong, es.map(_._2).sum)
    }.toSeq
    val want = hourly.groupBy(_._1 / 6).toSeq.map { case (w, hs) =>
      val nTot = hs.map(_._2).sum; val nErr = hs.map(_._3).sum
      val longPpm = 1000000L * nErr / nTot
      val shorts = hs.map(h => 1000000L * h._3 / h._2)
      (w * 6, nTot, nErr, longPpm, shorts.max,
        shorts.count(s => s > 200000L && longPpm > 200000L).toLong)
    }.sortBy(_._1)
    assert(got.toSeq === want)
    assert(got.nonEmpty)
  }

  test("sprt monitor replays from a serial cumulative-llr simulation") {
    val dir = sf("sf0.001")
    val got = Analytics4.sprtMonitor(spark, dir).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_total"),
        r.getAs[Long]("n_b"), r.getAs[Double]("llr"),
        r.getAs[String]("decision"))).toSeq
    val evs = Tables.t(spark, dir, "events")
      .select(expr("ts DIV 86400000000000").cast("long"),
        expr("user_id % 2").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val daily = evs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, es) => (d, es.size.toLong, es.count(_._2 == 1L).toLong) }
    var (n, k) = (0L, 0L)
    val want = daily.map { case (d, nd, kd) =>
      n += nd; k += kd
      val llr = k * 0.09531017980432493 + (n - k) * -0.10536051565782628
      val dec = if (llr >= 2.9444389791664403) "accept_h1"
      else if (llr <= -2.9444389791664403) "accept_h0" else "continue"
      (d, n, k, llr, dec)
    }
    assert(got === want)
    // the fixture's split is fair: drift is negative, and once the
    // cumulative N is past the Wald bound region the monitor settles
    assert(got.last._5 === "accept_h0")
    // cumulative counts are monotone by construction
    assert(got.map(_._2) === got.map(_._2).sorted)
  }
}
