package graft

import graft.operators.Relational5

/** Pins dqDriftReport's two computation paths (see dqDriftFromCells):
  * the exact rational below the 95 M-per-side bound, and the
  * pre-normalized fixed-1e6-grid path above it — synthetic cells stand
  * in for the >2⁶³-product corpora the harness can't materialize. */
class DriftNormalizationSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def report(cells: Seq[(String, Long, Long, Long)]): Map[String, Row] = {
    import spark.implicits._
    Relational5.dqDriftFromCells(cells.toDF("event_type", "bin", "r", "c"))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("below the bound: the exact rational, unchanged") {
    val out = report(Seq(("t", 0L, 3L, 1L), ("t", 1L, 1L, 3L)))
    // TV = ½(|¾−¼| + |¼−¾|) = ½ → 500 permille, computed exactly
    assert(out("t").getLong(3) === 500L)
  }

  test("above the bound: the pre-normalized path, hand-checked") {
    // 2e8 rows per side — the exact path's |r·C − c·R| sum would need
    // 500·2·(2e8)² ≈ 4e19 > 2⁶³; the normalized path reduces each side
    // by k = 2e8 div 1e6 = 200 first
    val r = Seq(100000001L, 99999999L)
    val c = Seq(123456789L, 76543211L)
    val out = report(Seq(("big", 0L, r(0), c(0)), ("big", 1L, r(1), c(1))))
    // independent recompute of the documented formula with BigInt
    val (kR, kC) = (BigInt(200), BigInt(200))
    val rs = r.map(BigInt(_) / kR); val cs = c.map(BigInt(_) / kC)
    val (nsR, nsC) = (rs.sum, cs.sum)
    val num = rs.zip(cs).map { case (a, b) => (a * nsC - b * nsR).abs }.sum
    val want = (BigInt(500) * num / (nsR * nsC)).toLong
    assert(out("big").getLong(1) === 200000000L) // n_ref stays the RAW total
    assert(out("big").getLong(3) === want)
    // and the reduction cost is sub-permille: true TV here is 117.28‰
    assert(want === 117L)
  }

  test("the two paths agree on a proportionally scaled distribution") {
    val out = report(Seq(
      ("small", 0L, 15L, 5L), ("small", 1L, 5L, 15L),
      ("big", 0L, 150000000L, 50000000L), ("big", 1L, 50000000L, 150000000L)))
    assert(out("small").getLong(3) === 500L)
    assert(out("big").getLong(3) === 500L)
  }

  test("an empty side reports the disjoint sentinel under both paths") {
    val out = report(Seq(
      ("noref", 0L, 0L, 5L),
      ("nobig", 0L, 0L, 200000000L)))
    assert(out("noref").getLong(3) === 1000L)
    assert(out("nobig").getLong(3) === 1000L)
  }
}
