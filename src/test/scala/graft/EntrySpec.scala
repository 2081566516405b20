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
    val maps = Seq(
      operators.Relational.queries, operators.Relational2.queries,
      operators.Relational3.queries, operators.Skew.queries,
      operators.TimeSeries.queries, operators.Relational4.queries,
      text.TextAnalysis.queries, dedup.Dedup.queries,
      sim.Similarity.queries, multimodal.Multimodal.queries,
      aria.AriaQueries.queries, streaming.StreamingQueries.queries,
      sources.Formats.queries)
    val total = maps.map(_.size).sum
    assert(SparkEntry.queries.size === total,
      "duplicate query names collapsed in the merged map")
  }
}
