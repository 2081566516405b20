package graft

/** The driver contract surface itself: entry() returns rows, every
  * declared query has a builder, and every oracle key has a query. */
class EntrySpec extends SparkSpec {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are stable and unique across modules") {
    val total = SparkEntry.modules.map(_._1.size).sum
    assert(SparkEntry.queries.size === total,
      "duplicate query names collapsed in the merged map")
    val oracleTotal = SparkEntry.modules.map(_._2.size).sum
    assert(SparkEntry.oracleSql.size === oracleTotal,
      "duplicate oracle names collapsed in the merged map")
  }
}
