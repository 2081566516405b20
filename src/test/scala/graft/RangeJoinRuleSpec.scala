package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Tables

/** The BucketizeRangeJoin optimizer rule: a pure point-in-interval
  * inequality join (no equi conjunct) plans as BroadcastNestedLoopJoin
  * by default; with the rule it becomes a bucketed equi-join with
  * identical results. */
class RangeJoinRuleSpec extends SparkSpec {

  private val w = 1800L * 1000000L // 30 min in µs

  /** Pure interval join: click → all events in the following 30 min,
    * regardless of user (no equi key, worst case for the planner). */
  private def intervalJoin(s: SparkSession): DataFrame = {
    val dir = sf("sf0.001")
    val ev = Tables.t(s, dir, "events")
      .select(col("event_id").as("other_id"), expr("ts div 1000").as("other_us"))
    val clicks = Tables.t(s, dir, "events")
      .filter(col("event_type") === "click").limit(50)
      .select(col("event_id").as("click_id"), expr("ts div 1000").as("click_us"))
    clicks.join(ev,
      col("other_us") > col("click_us") &&
        col("other_us") <= col("click_us") + lit(w))
      .groupBy("click_id")
      .agg(count(lit(1)).as("n"), min("other_id").as("first_other"))
      .orderBy("click_id")
  }

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("without the rule the interval join is a nested loop; with it, an equi-join") {
    // newSession: the shared spec session may already carry the rule
    // (ExtensionsSpec.register) — the baseline needs a clean optimizer
    val base = planString(intervalJoin(spark.newSession()))
    assert(base.contains("BroadcastNestedLoopJoin"), base.take(1200))

    val ruled = spark.newSession()
    graft.plans.GraftExtensions.register(ruled)
    val p = planString(intervalJoin(ruled))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("Generate"), p.take(2000)) // the ≤2-bucket explode
  }

  test("joins that already carry an inter-side equi key are left alone") {
    val s = spark.newSession()
    graft.plans.GraftExtensions.register(s)
    val dir = sf("sf0.001")
    val ev = Tables.t(s, dir, "events")
      .select(col("user_id").as("o_user"), expr("ts div 1000").as("other_us"))
    val clicks = Tables.t(s, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        expr("ts div 1000").as("click_us"))
    val joined = clicks.join(ev,
      col("o_user") === col("c_user") &&
        col("other_us") > col("click_us") &&
        col("other_us") <= col("click_us") + lit(w))
      .groupBy("click_id").agg(count(lit(1)).as("n"))
    val p = planString(joined)
    // equi key present → Spark hash-joins it already; the rule must not
    // explode a side for nothing
    assert(!p.contains("Generate"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("the rewrite is result-identical to the nested-loop plan") {
    val base = intervalJoin(spark.newSession()).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val ruled = spark.newSession()
    graft.plans.GraftExtensions.register(ruled)
    val got = intervalJoin(ruled).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(base.nonEmpty)
    assert(got === base)
  }

  test("rewrite identity holds on randomized data including negative domains") {
    // the documented constraint is non-negative time; this shows the
    // bucket-containment argument is conservative — truncating division
    // keeps the ≤2-bucket cover on negatives too (seeded, deterministic)
    val rnd = new scala.util.Random(11)
    def mk(s: SparkSession, seq: Seq[Long], name: String) = {
      import s.implicits._
      seq.toDF(name)
    }
    val points = Seq.fill(250)(rnd.nextLong() % 100000L)
    val starts = Seq.fill(250)(rnd.nextLong() % 100000L)
    val wSmall = 3600L
    def run(s: SparkSession): Seq[(Long, Long)] = {
      val j = mk(s, points, "p").join(mk(s, starts, "s"),
        col("p") > col("s") && col("p") <= col("s") + lit(wSmall))
      j.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    }
    val base = run(spark.newSession())
    val ruled = spark.newSession()
    graft.plans.GraftExtensions.register(ruled)
    // the rewrite must actually FIRE here, or the identity is vacuous
    val ruledPlan = planString(mk(ruled, points, "p").join(mk(ruled, starts, "s"),
      col("p") > col("s") && col("p") <= col("s") + lit(wSmall)))
    assert(!ruledPlan.contains("BroadcastNestedLoopJoin"), ruledPlan.take(1500))
    assert(base.nonEmpty)
    assert(run(ruled) === base)
  }
}
