package graft

import org.apache.spark.sql.functions._

/** Double-entry checks for the round-11 robust-stats/smoothing pair:
  * the MAD report and the dyadic EWMA are recomputed with plain Scala
  * arithmetic from the raw events — a third evaluation path beside
  * Spark SQL and the DuckDB oracle. */
class RobustStatsSpec extends SparkSpec {

  private lazy val dir = sf("sf0.001")

  private def quant(d: Double): Long = math.floor(d * 10000d + 0.5d).toLong

  test("MAD outliers: medians, MAD and outlier counts match a plain-Scala replay") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("event_id"), col("value").cast("double").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("event_id"), quant(r.getDouble(2))))
    def med2Of(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1) // doubled interpolated median
    }
    val want = ev.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.map(_._3).toSeq
      val med2 = med2Of(xs)
      val ds = xs.map(x => math.abs(2 * x - med2))
      val mad4 = med2Of(ds)
      t -> (xs.length.toLong, med2, mad4, ds.count(d => 2 * d > 3 * mad4).toLong)
    }
    val got = graft.operators.Analytics.madOutliers(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("med2"),
        r.getAs[Long]("mad4"), r.getAs[Long]("n_outliers"))).toMap
    assert(got === want)
    assert(got.nonEmpty && got.values.exists(_._4 > 0L),
      "fixture should surface at least one MAD outlier")
  }

  test("EWMA: numerators are the exact dyadic convolution of each user's trailing 8 values") {
    // independently rebuild each user's (ts_us, event_id)-ordered series
    // (the loader's normalized epoch-ns ts, like the operator reads)
    val series = graft.operators.Tables.t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        col("value").cast("double").as("v"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
        r.getAs[Long]("event_id"), quant(r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3)).toVector).toMap
    val rows = graft.operators.TimeSeries.ewmaSmooth(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val seq = series(u)
      val posOf = seq.zipWithIndex.map { case (t, i) => t._3 -> i }.toMap
      // full frames only: first 7 positions of every series are absent
      assert(rs.length === seq.length - 7)
      rs.foreach { r =>
        val end = posOf(r.getAs[Long]("event_id"))
        assert(end >= 7)
        val want = (0 until 8).map(j => seq(end - j)._4 * (1L << (7 - j))).sum
        assert(r.getAs[Long]("ewma_num") === want,
          s"user $u event ${r.getAs[Long]("event_id")}: ${r.getAs[Long]("ewma_num")} != $want")
        assert(r.getAs[Double]("ewma") === want.toDouble / 255.0)
      }
    }
  }
}
