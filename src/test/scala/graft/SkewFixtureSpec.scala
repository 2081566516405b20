package graft

import org.apache.spark.sql.functions._
import graft.tools.SkewFixture

/** Pins the skew-stress fixture's three load-bearing properties
  * (BASELINE.md "Skewed 8× fixture"): a real hot key, replica-unique
  * line identity, and determinism — so a future edit can't silently
  * turn the stress measurement into a uniform-key one.
  */
class SkewFixtureSpec extends SparkSpec {

  private lazy val fx =
    SkewFixture.skewedLineitem(spark, sf("sf0.001"), factor = 4).cache()

  test("one flag holds ~half the rows (the deliberate hot key)") {
    val total = fx.count()
    assert(total == 6000L * 4)
    val byFlag = fx.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFlag.keySet == Set("N", "A", "R"))
    val hotShare = byFlag("N").toDouble / total
    assert(hotShare > 0.45 && hotShare < 0.55,
      s"hot key 'N' share $hotShare drifted from the designed ~50%")
    assert(byFlag("A") > byFlag("R"), "designed split is 50/30/20")
  }

  test("replica key ranges never collide (salt spread scales with factor)") {
    // The STOCK testdata reuses (l_orderkey, l_linenumber) pairs (~76%
    // distinct at every sf — generator artifact), so within-replica
    // duplicates are inherited. What the fixture must guarantee is that
    // the replica offset keeps replicas disjoint: the distinct-pair
    // count — the domain the salt hash spreads over — scales exactly
    // ×factor. Overlapping replicas would collapse it back toward 1×.
    val stockDistinct = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select("l_orderkey", "l_linenumber").distinct().count()
    assert(fx.select("l_orderkey", "l_linenumber").distinct().count()
      == stockDistinct * 4)
  }

  test("flag assignment is deterministic and replica-consistent") {
    val again = SkewFixture.skewedLineitem(spark, sf("sf0.001"), factor = 4)
    assert(fx.exceptAll(again).isEmpty && again.exceptAll(fx).isEmpty)
    // every replica of a line carries the SAME flag (hash is computed
    // before the key offset), so replication never reshapes the skew
    val perLine = fx
      .withColumn("base_key", pmod(col("l_orderkey"), lit(SkewFixture.ReplicaOffset)))
      .groupBy("base_key", "l_linenumber")
      .agg(countDistinct("l_returnflag").as("nflags"))
    assert(perLine.filter(col("nflags") > 1).count() == 0)
  }
}
