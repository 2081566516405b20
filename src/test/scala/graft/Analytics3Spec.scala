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
}
