package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Semantic invariants of the temporal operators — properties the
  * hash oracle implies but which should fail loudly on their own. */
class TemporalSpec extends SparkSpec {

  test("funnel stages are monotonically non-increasing") {
    val rows = Temporal.funnelConversion(spark, sf("sf0.001"))
      .orderBy("stage").collect()
    assert(rows.length === 3)
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), ns.mkString(","))
    assert(rows.map(_.getAs[Double]("share_of_entry")).head === 1.0)
  }

  test("scd2 intervals tile each user's timeline: valid_to = next valid_from") {
    val iv = Temporal.scd2Intervals(spark, sf("sf0.001"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("version")
    val bad = iv
      .withColumn("next_from", lead("valid_from_us", 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
      .count()
    assert(bad === 0L, s"$bad non-tiling intervals")
  }

  test("scd2 versions are dense from 1 and only the last is open-ended") {
    val iv = Temporal.scd2Intervals(spark, sf("sf0.001")).cache()
    try {
      val perUser = iv.groupBy("user_id")
        .agg(count(lit(1)).as("n"), max("version").as("maxv"),
          sum(when(col("valid_to_us").isNull, 1L).otherwise(0L)).as("open"))
      assert(perUser.filter(col("n") =!= col("maxv")).count() === 0L,
        "versions must be dense 1..n")
      assert(perUser.filter(col("open") =!= 1L).count() === 0L,
        "exactly one open interval per user")
    } finally iv.unpersist()
  }

  test("LOCF downsample: boundary event carried in, pre-first-event grid is NULL") {
    import spark.implicits._
    val hourNs = 3600L * 1000000000L
    // user 1: event exactly ON hour 2 (carried into that grid point),
    // another at 2h30 (fills hour 3+), span forces grid hours 2..4.
    // user 2: single mid-hour event → its only grid point (hour 5)
    // precedes the event, so the fill is NULL.
    val ev = Seq(
      (1L, 2L * hourNs, 10.0),
      (1L, 2L * hourNs + 1800L * 1000000000L, 20.0),
      (1L, 4L * hourNs + 60L * 1000000000L, 30.0),
      (2L, 5L * hourNs + 60L * 1000000000L, 99.0)
    ).toDF("user_id", "tns", "value")
    val got = graft.operators.TimeSeries.downsampleLocfFrom(ev)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got === Seq(
      (1L, 2L * hourNs / 1000, Some(10.0)), // boundary event included
      (1L, 3L * hourNs / 1000, Some(20.0)), // LOCF from 2h30
      (1L, 4L * hourNs / 1000, Some(20.0)), // 4h04 event NOT yet visible
      (2L, 5L * hourNs / 1000, None))) // grid precedes first event
  }

  test("linear interpolation: midpoint halves, boundary exact, edges back/forward-fill") {
    import spark.implicits._
    val hourNs = 3600L * 1000000000L
    // user 1: samples at exactly hour 2 (v=10) and hour 4 (v=30); grid
    // hours 2..4, so hour 3 is the exact midpoint → 20.0. user 2: one
    // mid-hour sample; its only grid point precedes it → back-fill.
    val ev = Seq(
      (1L, 2L * hourNs, 10.0),
      (1L, 4L * hourNs, 30.0),
      (2L, 5L * hourNs + 60L * 1000000000L, 99.0)
    ).toDF("user_id", "tns", "value")
    val got = graft.operators.TimeSeries.interpolateGridFrom(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq(
      (1L, 2L * hourNs / 1000, 10.0), // sample exactly on the grid instant
      (1L, 3L * hourNs / 1000, 20.0), // true midpoint of (10, 30)
      (1L, 4L * hourNs / 1000, 30.0), // trailing boundary sample
      (2L, 5L * hourNs / 1000, 99.0))) // leading grid point back-fills
  }

  test("cumulative users: final count equals countDistinct, curve is monotone") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val dir = sf("sf0.001")
    val cum = graft.operators.Analytics.cumulativeUsers(spark, dir).collect()
    assert(cum.nonEmpty)
    val finalPerType = cum.groupBy(_.getString(0)).map { case (t, rows) =>
      t -> rows.map(_.getAs[Long]("cum_users")).max }
    val expected = graft.operators.Tables.t(spark, dir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(finalPerType === expected,
      "last cumulative value must equal the type's total distinct users")
    cum.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val curve = rows.sortBy(_.getAs[Long]("hour_start_s")).map(_.getAs[Long]("cum_users"))
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b }, s"$t not monotone")
      assert(rows.map(_.getAs[Long]("n_new")).sum === curve.last)
    }
  }

  test("drift report: totals partition the events, TV bounded, same-data drift is small") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val dir = sf("sf0.001")
    val r = graft.operators.Relational5.dqDriftReport(spark, dir).collect()
    assert(r.nonEmpty)
    val perType = graft.operators.Tables.t(spark, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { row =>
      val (t, nr, nc, tv) = (row.getString(0), row.getAs[Long]("n_ref"),
        row.getAs[Long]("n_cur"), row.getAs[Long]("tv_permille"))
      assert(nr + nc === perType(t), s"$t halves don't partition the type")
      assert(tv >= 0L && tv <= 1000L)
      // the generator is stationary across time, so same-source halves
      // must NOT read as drifted (the metric's false-positive guard)
      assert(tv < 300L, s"$t drift $tv‰ on stationary data")
    }
  }

  test("scd2 collapses consecutive duplicates: adjacent states differ") {
    val iv = Temporal.scd2Intervals(spark, sf("sf0.001"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("version")
    val dup = iv.withColumn("prev_state", lag("state", 1).over(w))
      .filter(col("prev_state") === col("state")).count()
    assert(dup === 0L, s"$dup un-collapsed consecutive states")
  }

  test("z-score outliers: a planted spike flags, the flat tail does not") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_z").toString
    // user 1: values alternate 10.0/12.0 (nonzero variance) except event
    // 25 spikes to 500 → only the spike clears |z| > 3 with a full
    // 20-event trailing window. µs-aligned ns timestamps per convention.
    val rows = (0 until 40).map { i =>
      val v = if (i == 25) 500.0 else if (i % 2 == 0) 10.0 else 12.0
      (i.toLong, i.toLong * 1000000000L, 1L, "click", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.operators.TimeSeries.zscoreOutliers(spark, tmp).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(25L), got.mkString(","))
    // z recomputes from the trailing 20 values: mean 11 (10 evens, 10
    // odds), var = 1 → z = (500-11)/1 = 489
    assert(math.abs(got.head.getDouble(4) - 489.0) < 1e-9, got.head.toString)
  }
}
