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

  test("hot-node fixture: one supplier endpoint on ~1/3 of edges, degree scales ×factor") {
    // write factor-1 and factor-2 fixtures and compare the DERIVED
    // graph: the hot node's degree must scale with the data while its
    // edge share stays constant — the property that distinguishes one
    // global head node from `factor` medium ones.
    val out1 = java.nio.file.Files.createTempDirectory("hotnode1").toString
    val out2 = java.nio.file.Files.createTempDirectory("hotnode2").toString
    SkewFixture.hotNodeLineitem(spark, sf("sf0.001"), factor = 1)
      .write.mode("overwrite").parquet(s"$out1/lineitem.parquet")
    SkewFixture.hotNodeLineitem(spark, sf("sf0.001"), factor = 2)
      .write.mode("overwrite").parquet(s"$out2/lineitem.parquet")
    val hotNode = SkewFixture.HotSupp * 2 + 1
    def stats(dir: String): (Long, Long) = {
      val e = graft.sim.GraphOps.edges(spark, dir)
      (e.count(), e.filter(col("src") === hotNode).count())
    }
    val (e1, h1) = stats(out1)
    val (e2, h2) = stats(out2)
    assert(h2 === h1 * 2, "hot degree must scale exactly ×factor")
    val share1 = 2.0 * h1 / e1
    val share2 = 2.0 * h2 / e2
    // sf0.001's cold projection is dense (10 suppliers) and dedups
    // hard, inflating the share vs the measurement fixture's sf0.1
    // (34.0% there, ~53% here) — pin a sane band, not the sf0.1 value
    assert(share1 > 0.25 && share1 < 0.60,
      s"hot endpoint share $share1 drifted from the designed ~1/3")
    assert(math.abs(share1 - share2) < 0.02,
      "share must stay constant across factors (one GLOBAL head node)")
    // the hot node is the minimal odd id → lands in the 8-supplier
    // landmark panel of ppr/betweenness/closeness by construction
    val minOdd = graft.sim.GraphOps.edges(spark, out1)
      .filter(col("src") % 2 === 1).agg(min("src")).head().getLong(0)
    assert(minOdd === hotNode)
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
