package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavior

/** Semantic invariants of the behavioral-analytics operators and the
  * n-gram novelty score — properties the hash oracle implies but which
  * should fail loudly on their own. */
class BehaviorSpec extends SparkSpec {

  test("retention cohorts: offset 0 is the full cohort, later offsets never exceed it") {
    val rows = Behavior.retentionCohorts(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, nAct, nCoh, pm) = (r.getAs[Long]("offset_days"),
        r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
        r.getAs[Long]("retention_permille"))
      assert(off >= 0L, s"negative offset $off")
      assert(nAct <= nCoh, s"active $nAct > cohort $nCoh")
      assert(pm >= 0L && pm <= 1000L, s"permille $pm out of range")
      if (off == 0L) assert(pm === 1000L && nAct === nCoh,
        "offset 0 must be the cohort itself")
    }
  }

  test("retention cohorts: cohort sizes partition the distinct-user universe") {
    val df = Behavior.retentionCohorts(spark, sf("sf0.001"))
    val cohortTotal = df.filter(col("offset_days") === 0L)
      .agg(sum("n_cohort")).collect()(0).getLong(0)
    val users = graft.operators.Tables.t(spark, sf("sf0.001"), "events")
      .select("user_id").distinct().count()
    assert(cohortTotal === users,
      s"cohort sizes sum to $cohortTotal, distinct users $users")
  }

  test("event transitions: per-source step counts equal events minus last events") {
    val dir = sf("sf0.001")
    val tr = Behavior.eventTransitions(spark, dir)
    val totalSteps = tr.agg(sum("n")).collect()(0).getLong(0)
    val ev = graft.operators.Tables.t(spark, dir, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(totalSteps === expected,
      s"steps $totalSteps != events - users = $expected")
    // permille rows are consistent with their own counts
    val bad = tr.filter(col("p_permille") =!=
      expr("(1000 * n) div n_src")).count()
    assert(bad === 0L)
    // each src row-total is self-consistent
    val mismatch = tr.groupBy("src")
      .agg(sum("n").as("s"), min("n_src").as("t"), max("n_src").as("t2"))
      .filter(col("s") =!= col("t") || col("t") =!= col("t2")).count()
    assert(mismatch === 0L, "n_src must equal the per-src sum of n")
  }

  test("ngram novelty: a cloned document zeroes both copies, unique text scores 1000") {
    import spark.implicits._
    import graft.text.TextAnalysis.tokens
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // clone of 2 → every bigram df=2
      (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta"),   // all bigrams unique → 1000
      (4L, "solo")                      // <2 tokens → excluded
    ).toDF("doc_id", "text")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val got = graft.text.Retrieval.ngramNoveltyFrom(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("novelty_permille")).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1000L))
  }

  test("rfm segments: scores in 1..3, user total equals purchasing-user count") {
    val dir = sf("sf0.001")
    val rows = Behavior.rfmSegments(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c); assert(v >= 1L && v <= 3L) }
      assert(r.getAs[Long]("n_users") >= 1L)
    }
    val totalUsers = rows.map(_.getAs[Long]("n_users")).sum
    val purchasers = graft.operators.Tables.t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(totalUsers === purchasers, "segments must partition purchasing users")
  }

  test("active users: wau >= dau, both bounded by the user universe, wau covers the window") {
    val dir = sf("sf0.001")
    val ev = graft.operators.Tables.t(spark, dir, "events")
    val users = ev.select("user_id").distinct().count()
    val rows = Behavior.activeUsers(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
      assert(wau >= dau, s"wau $wau < dau $dau")
      assert(wau <= users)
    }
    // double-entry on one interior day: WAU(d) = distinct users active in [d-6, d]
    val dayNs = 86400L * 1000 * 1000 * 1000
    val midS = rows(rows.length / 2).getAs[Long]("day_start_s")
    val midDay = midS / 86400L
    val manual = ev.select(col("user_id"), expr(s"ts div $dayNs").as("day"))
      .filter(col("day") >= midDay - 6L && col("day") <= midDay)
      .select("user_id").distinct().count()
    val reported = rows.find(_.getAs[Long]("day_start_s") == midS).get.getAs[Long]("wau")
    assert(reported === manual, s"wau($midDay): $reported != $manual")
  }

  test("substring spans: a planted 200-token shared passage reports as ONE maximal span") {
    import spark.implicits._
    // the Lee et al. maximal-extension property the fixed-8-gram
    // detector lacks: a long shared passage must collapse to a single
    // span per doc, not 193 overlapping 8-grams. Surrounding tokens are
    // unique per doc, so boundary-straddling grams occur once and the
    // covered-start runs are exactly the passage interiors.
    val shared = (1 to 200).map(i => s"s$i")
    val doc1 = (1 to 20).map(i => s"a$i") ++ shared ++ (21 to 40).map(i => s"a$i")
    val doc2 = (1 to 35).map(i => s"b$i") ++ shared ++ (36 to 50).map(i => s"b$i")
    val toks = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "toks")
    val got = graft.dedup.Dedup.substringSpansFrom(toks, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 21L, 200L), (2L, 36L, 200L)))
  }

  test("substring spans: a WITHIN-doc repeat is duplicated corpus-wide and reports both copies") {
    import spark.implicits._
    val block = (1 to 20).map(i => s"s$i")
    val doc = block ++ (1 to 30).map(i => s"c$i") ++ block
    val toks = Seq((3L, doc)).toDF("doc_id", "toks")
    val got = graft.dedup.Dedup.substringSpansFrom(toks, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // covered starts 1..13 and 51..63 → two maximal 20-token spans
    assert(got === Set((3L, 1L, 20L), (3L, 51L, 20L)))
  }

  test("substring spans: the sub-k blind spot exists and cannot reach the removal policy") {
    import spark.implicits._
    // SENSITIVITY GATE (vs a true suffix array): the seed-based method
    // detects duplicated substrings of length ≥ k ONLY — a 7-token
    // shared passage produces zero 8-gram seeds, so it is invisible.
    val tiny = (1 to 7).map(i => s"t$i")
    val d1 = (1 to 12).map(i => s"a$i") ++ tiny ++ (13 to 24).map(i => s"a$i")
    val d2 = (1 to 12).map(i => s"b$i") ++ tiny ++ (13 to 24).map(i => s"b$i")
    val toks = Seq((1L, d1), (2L, d2)).toDF("doc_id", "toks")
    assert(graft.dedup.Dedup.substringSpansFrom(toks, k = 8).collect().isEmpty,
      "sub-k passage unexpectedly detected — blind spot documentation is stale")
    // ...and exactly k is the detection frontier
    val atK = (1 to 8).map(i => s"k$i")
    val e1 = (1 to 12).map(i => s"c$i") ++ atK ++ (13 to 24).map(i => s"c$i")
    val e2 = (1 to 12).map(i => s"d$i") ++ atK ++ (13 to 24).map(i => s"d$i")
    val toksK = Seq((1L, e1), (2L, e2)).toDF("doc_id", "toks")
    assert(graft.dedup.Dedup.substringSpansFrom(toksK, k = 8).collect().nonEmpty,
      "k-length passage missed — detection frontier moved")
    // IMMATERIALITY: the removal policy only acts on spans ≥ 50 tokens,
    // and every duplicated passage of length L ≥ 50 ≥ k contributes all
    // its L−k+1 seeds, so the method reports it at FULL length — the
    // blind spot lies strictly below the policy threshold and can never
    // change a removal decision. Witness at the boundary: a 50-token
    // passage reports as one 50-token span and is removed whole.
    val fifty = (1 to 50).map(i => s"f$i")
    val g1 = (1 to 10).map(i => s"e$i") ++ fifty ++ (11 to 20).map(i => s"e$i")
    val g2 = (1 to 10).map(i => s"g$i") ++ fifty ++ (11 to 20).map(i => s"g$i")
    val toksF = Seq((1L, g1), (2L, g2)).toDF("doc_id", "toks")
    val spans = graft.dedup.Dedup.substringSpansFrom(toksF, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((1L, 11L, 50L), (2L, 11L, 50L)),
      s"50-token passage not reported at full length: $spans")
    val removed = graft.dedup.Dedup.substringRemovalFrom(toksF, k = 8, minSpan = 50)
      .filter($"doc_id" === 1L).collect().head
    assert(removed.getLong(2) === 50L, s"policy removal incomplete: $removed")
  }

  test("substring share: per-doc duplicated-token permille, clean docs report zero") {
    import spark.implicits._
    val shared = (1 to 200).map(i => s"s$i")
    val doc1 = (1 to 20).map(i => s"a$i") ++ shared ++ (21 to 40).map(i => s"a$i")
    val doc2 = (1 to 35).map(i => s"b$i") ++ shared ++ (36 to 50).map(i => s"b$i")
    val doc4 = (1 to 30).map(i => s"d$i")
    val toks = Seq((1L, doc1), (2L, doc2), (4L, doc4)).toDF("doc_id", "toks")
    val got = graft.dedup.Dedup.substringShareFrom(toks, k = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === Seq(
      (1L, 240L, 1L, 200L, 833L), // 1000*200 DIV 240
      (2L, 250L, 1L, 200L, 800L),
      (4L, 30L, 0L, 0L, 0L)))
  }

  test("substring removal: only spans past the 50-token policy threshold are cut") {
    import spark.implicits._
    // doc 1 and doc 2 share a 60-token passage (removed) AND a 20-token
    // passage (duplicated but under the policy threshold — kept);
    // doc 5 is clean. Total row rolls up at doc_id = -1.
    val long = (1 to 60).map(i => s"L$i")
    val short = (1 to 20).map(i => s"S$i")
    val doc1 = (1 to 10).map(i => s"a$i") ++ long ++ (11 to 20).map(i => s"a$i") ++ short
    val doc2 = (1 to 10).map(i => s"b$i") ++ long ++ (11 to 20).map(i => s"b$i") ++ short
    val doc5 = (1 to 25).map(i => s"e$i")
    val toks = Seq((1L, doc1), (2L, doc2), (5L, doc5)).toDF("doc_id", "toks")
    val got = graft.dedup.Dedup.substringRemovalFrom(toks, k = 8, minSpan = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (-1L, 225L, 120L, 105L),
      (1L, 100L, 60L, 40L),
      (2L, 100L, 60L, 40L),
      (5L, 25L, 0L, 25L)))
  }

  test("contamination mask: eval passages mark maximal train spans, train-only dups do not") {
    import spark.implicits._
    // train doc 1 embeds a 40-token passage that also appears in an
    // EVAL doc → one maximal 40-token span at its position; train docs
    // 2 and 3 share a passage with EACH OTHER but not with eval → NOT
    // contamination (that's the dedup family's business, not the
    // decontamination mask's); doc 4 is clean.
    val evalPassage = (1 to 40).map(i => s"E$i")
    val trainOnly = (1 to 20).map(i => s"T$i")
    val train = Seq(
      (1L, (1 to 10).map(i => s"a$i") ++ evalPassage ++ (11 to 20).map(i => s"a$i")),
      (2L, trainOnly ++ (1 to 15).map(i => s"b$i")),
      (3L, (1 to 15).map(i => s"c$i") ++ trainOnly),
      (4L, (1 to 25).map(i => s"d$i"))).toDF("doc_id", "toks")
    val eval = Seq(
      (100L, (1 to 5).map(i => s"x$i") ++ evalPassage ++ (6 to 10).map(i => s"x$i"))
    ).toDF("doc_id", "toks")
    val got = graft.dedup.Dedup.contaminationMaskFrom(train, eval, k = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === Seq(
      (1L, 60L, 1L, 40L, 666L), // one maximal span, 1000*40 DIV 60
      (2L, 35L, 0L, 0L, 0L),
      (3L, 35L, 0L, 0L, 0L),
      (4L, 25L, 0L, 0L, 0L)))
  }

  test("golden record: only multi-member clusters, canonical present, sizes consistent") {
    val rows = graft.dedup.Dedup.goldenRecord(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty, "sf0.01 has near-dup clusters; survivorship must surface them")
    val memberOf = graft.dedup.Dedup.nearDupClusters(spark, sf("sf0.01"))
      .select("doc_id", "cluster_rep").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2L)
      // canonical_chars is defined iff the rep row LANDED in its own
      // cluster: with bounded 5-round label propagation, a rep on a deep
      // component can itself carry a smaller label, leaving its group
      // without the canonical member row — assert presence only then
      val cid = r.getAs[Long]("canonical_id")
      if (memberOf.get(cid).contains(cid)) {
        assert(!r.isNullAt(r.fieldIndex("canonical_chars")))
        assert(r.getAs[Long]("max_member_chars") >= r.getAs[Long]("canonical_chars"))
      }
      assert(r.getAs[Long]("total_chars") >= r.getAs[Long]("max_member_chars"))
      assert(r.getAs[Long]("n_sources") >= 1L && r.getAs[Long]("n_langs") >= 1L)
    }
  }

  test("ngram novelty: harness corpus scores stay in range and count grams consistently") {
    val df = graft.text.Retrieval.ngramNovelty(spark, sf("sf0.001"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u, pm) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_unique"),
        r.getAs[Long]("novelty_permille"))
      assert(u >= 0L && u <= n)
      assert(pm === 1000L * u / n)
    }
  }
}
