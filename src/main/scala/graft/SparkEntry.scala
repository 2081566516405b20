package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in the operator modules; this object only aggregates the
  * name → builder and name → oracle-SQL maps the harness consumes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Relational2.queries ++
      operators.Relational3.queries ++ operators.Skew.queries ++
      operators.Sketches.queries ++ operators.TpchMore.queries ++
      operators.TimeSeries.queries ++ operators.Relational4.queries ++
      text.TextAnalysis.queries ++ text.Retrieval.queries ++
      dedup.Dedup.queries ++ sim.Similarity.queries ++
      sim.Embeddings.queries ++ sim.GraphOps.queries ++
      multimodal.Multimodal.queries ++ aria.AriaQueries.queries ++
      streaming.StreamingQueries.queries ++ sources.Formats.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Relational2.oracles ++
      operators.Relational3.oracles ++ operators.Skew.oracles ++
      operators.Sketches.oracles ++ operators.TpchMore.oracles ++
      operators.TimeSeries.oracles ++ operators.Relational4.oracles ++
      text.TextAnalysis.oracles ++ text.Retrieval.oracles ++
      dedup.Dedup.oracles ++ sim.Similarity.oracles ++
      sim.Embeddings.oracles ++ sim.GraphOps.oracles ++
      multimodal.Multimodal.oracles ++ aria.AriaQueries.oracles ++
      streaming.StreamingQueries.oracles ++ sources.Formats.oracles
}
