package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** The native as-of join operator (LogicalPlan + Strategy + merge
  * SparkPlan): edge semantics on synthetic rows, and full equivalence
  * with the window-composition form on the harness data. */
class AsOfJoinNativeSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long)], names: (String, String)) = {
    import spark.implicits._
    rows.toDF(names._1, names._2)
  }

  test("matches at-or-before semantics, null before the first right row") {
    import spark.implicits._
    val left = Seq((1L, 5L, 100L), (1L, 10L, 101L), (1L, 20L, 102L), (2L, 7L, 200L))
      .toDF("k", "t", "row_id")
    val right = Seq((1L, 10L, 1010L), (1L, 15L, 1015L), (2L, 8L, 2008L))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asof(left, right, "k", "t", "v", "asof_v")
      .select("row_id", "asof_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(100L) === None, "t=5 precedes every right row")
    assert(out(101L) === Some(1010L), "t=10 matches the equal-ts right row")
    assert(out(102L) === Some(1015L), "t=20 takes the latest at-or-before")
    assert(out(200L) === None, "key 2's right row is at t=8 > 7")
  }

  test("keys with no right rows at all yield null") {
    import spark.implicits._
    val left = Seq((5L, 1L, 1L)).toDF("k", "t", "row_id")
    val right = Seq((6L, 1L, 66L)).toDF("k", "t", "v")
    val out = AsOfJoin.asof(left, right, "k", "t", "v", "asof_v").collect()
    assert(out.length === 1 && out(0).isNullAt(3))
  }

  test("empty right side joins every left row to null") {
    import spark.implicits._
    val left = Seq((1L, 1L, 1L), (2L, 2L, 2L)).toDF("k", "t", "row_id")
    val right = Seq.empty[(Long, Long, Long)].toDF("k", "t", "v")
    val out = AsOfJoin.asof(left, right, "k", "t", "v", "asof_v").collect()
    assert(out.length === 2 && out.forall(_.isNullAt(3)))
  }

  test("native operator equals the batch inequality join on harness data") {
    import spark.implicits._
    val native = graft.operators.TimeSeries.asofJoinNative(spark, sf("sf0.001"))
      .collect().map(_.toSeq).toSeq
    val ev = graft.operators.Tables.t(spark, sf("sf0.001"), "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("click_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), expr("ts div 1000").as("err_us"))
    val expected = clicks.join(errors,
        col("user_id") === col("e_user") && col("err_us") <= col("click_us"), "left")
      .groupBy("user_id", "event_id", "click_us")
      .agg(max("err_us").as("asof_error_us"))
      .orderBy("user_id", "event_id")
      .collect().map(_.toSeq).toSeq
    assert(native === expected)
  }

  test("equal timestamps match (standard backward as-of, unlike the union window)") {
    import spark.implicits._
    val left = Seq((1L, 10L, 1L)).toDF("k", "t", "row_id")
    val right = Seq((1L, 10L, 42L)).toDF("k", "t", "v")
    val out = AsOfJoin.asof(left, right, "k", "t", "v", "asof_v").collect()
    assert(out(0).getLong(3) === 42L, "rt == lt must match")
  }

  test("string payload and int key/ts (typed-accessor generalization)") {
    import spark.implicits._
    val left = Seq((1, 5, 100L), (1, 12, 101L), (2, 9, 200L))
      .toDF("k", "t", "row_id")
    val right = Seq((1, 4, "alpha"), (1, 10, "beta"), (2, 10, "gamma"))
      .toDF("k", "t", "label")
    val out = AsOfJoin.asof(left, right, "k", "t", "label", "asof_label")
    assert(out.schema("asof_label").dataType ===
      org.apache.spark.sql.types.StringType)
    val m = out.collect()
      .map(r => r.getLong(2) -> Option(r.getString(3))).toMap
    assert(m(100L) === Some("alpha"), "t=5 takes the t=4 label")
    assert(m(101L) === Some("beta"), "t=12 takes the latest at-or-before")
    assert(m(200L) === None, "key 2's only right row is later")
  }

  test("buffer-backed payloads survive the reused-row lookahead (many rows)") {
    import spark.implicits._
    // enough rows that Unsafe row buffer reuse would corrupt un-copied
    // string payloads: every left row must see ITS key's latest label
    val left = (1L to 2000L).map(i => (i % 50, i, i)).toDF("k", "t", "row_id")
    val right = (1L to 2000L).map(i => (i % 50, i, s"v_${i % 50}_$i"))
      .toDF("k", "t", "label")
    val out = AsOfJoin.asof(left, right, "k", "t", "label", "asof_label")
      .collect()
    assert(out.length === 2000)
    out.foreach { r =>
      val k = r.getLong(0); val t = r.getLong(1)
      assert(r.getString(3) === s"v_${k}_$t", s"k=$k t=$t got ${r.getString(3)}")
    }
  }

  test("native as-of matches a pure-Scala reference on random data (5 seeds)") {
    import spark.implicits._
    // adversarial shapes: hot keys (20-key space), many-to-many, unique
    // (k,ts) on the right so the reference is deterministic, string
    // payloads so the copy path is always exercised
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 400).map(i =>
        (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val right = (1 to 300).map(_ => (rnd.nextInt(20), rnd.nextInt(1000)))
        .distinct.map { case (k, t) => (k.toLong, t.toLong, s"p_${k}_$t") }
      val expected = left.map { case (k, t, id) =>
        val cands = right.filter(r => r._1 == k && r._2 <= t)
        id -> (if (cands.isEmpty) null else cands.maxBy(_._2)._3)
      }.toMap
      val out = AsOfJoin.asof(
          left.toDF("k", "t", "row_id"), right.toDF("k", "t", "label"),
          "k", "t", "label", "asof_label")
        .collect()
        .map(r => r.getLong(2) -> (if (r.isNullAt(3)) null else r.getString(3)))
        .toMap
      assert(out === expected, s"seed=$seed")
    }
  }

  test("plan co-partitions and sorts both sides; scans stay pruned") {
    val df = graft.operators.TimeSeries.asofJoinNative(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(1200))
    // both sides hashpartitioned on the key and sorted (key, ts)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("!AsOfJoin"), "invalid plan marker:\n" + p.take(1200))
  }

  test("tolerance nulls matches staler than the bound, keeps fresh ones") {
    import spark.implicits._
    val left = Seq((1L, 100L, 1L), (1L, 105L, 2L), (1L, 200L, 3L))
      .toDF("k", "t", "row_id")
    val right = Seq((1L, 95L, "e95")).toDF("k", "t", "label")
    val out = AsOfJoin.asof(left, right, "k", "t", "label", "m", tolerance = 10L)
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    // t=100: staleness 5 <= 10 matches; t=105: staleness 10 (boundary)
    // matches; t=200: staleness 105 nulled
    assert(out === Map(1L -> "e95", 2L -> "e95", 3L -> null))
  }

  test("mismatched key/ts types fail fast instead of comparing raw units") {
    import spark.implicits._
    val left = Seq((1L, 100L, 1L)).toDF("k", "t", "row_id")
    val right = Seq((1, 95, "x")).toDF("k", "t", "label") // INT sides
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, "k", "t", "label", "m")
    }
    assert(e.getMessage.contains("types must match"))
  }
}
