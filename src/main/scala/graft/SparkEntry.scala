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

  /** Every module contributing (queries, oracles) — the single place a
    * new module registers; EntrySpec checks name uniqueness across it. */
  val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (operators.Relational.queries, operators.Relational.oracles),
    (operators.Relational2.queries, operators.Relational2.oracles),
    (operators.Relational3.queries, operators.Relational3.oracles),
    (operators.Skew.queries, operators.Skew.oracles),
    (operators.Sketches.queries, operators.Sketches.oracles),
    (operators.Analytics.queries, operators.Analytics.oracles),
    (operators.Analytics2.queries, operators.Analytics2.oracles),
    (operators.Analytics3.queries, operators.Analytics3.oracles),
    (operators.Behavior.queries, operators.Behavior.oracles),
    (operators.Analytics4.queries, operators.Analytics4.oracles),
    (operators.Analytics5.queries, operators.Analytics5.oracles),
    (operators.TpchMore.queries, operators.TpchMore.oracles),
    (operators.Tpch3.queries, operators.Tpch3.oracles),
    (operators.Temporal.queries, operators.Temporal.oracles),
    (operators.TimeSeries.queries, operators.TimeSeries.oracles),
    (operators.Relational4.queries, operators.Relational4.oracles),
    (operators.Relational5.queries, operators.Relational5.oracles),
    (operators.Layout.queries, operators.Layout.oracles),
    (text.TextAnalysis.queries, text.TextAnalysis.oracles),
    (text.Classify.queries, text.Classify.oracles),
    (text.Bpe.queries, text.Bpe.oracles),
    (text.Unigram.queries, text.Unigram.oracles),
    (text.WordPiece.queries, text.WordPiece.oracles),
    (text.ByteBpe.queries, text.ByteBpe.oracles),
    (text.TokenizerCompare.queries, text.TokenizerCompare.oracles),
    (text.Retrieval.queries, text.Retrieval.oracles),
    (text.Pipeline.queries, text.Pipeline.oracles),
    (text.UrlCuration.queries, text.UrlCuration.oracles),
    (dedup.Dedup.queries, dedup.Dedup.oracles),
    (sim.Similarity.queries, sim.Similarity.oracles),
    (sim.NnDescent.queries, sim.NnDescent.oracles),
    (sim.Clustering.queries, sim.Clustering.oracles),
    (sim.Pq.queries, sim.Pq.oracles),
    (sim.Pca.queries, sim.Pca.oracles),
    (sim.Embeddings.queries, sim.Embeddings.oracles),
    (sim.Mmr.queries, sim.Mmr.oracles),
    (sim.GraphOps.queries, sim.GraphOps.oracles),
    (multimodal.Multimodal.queries, multimodal.Multimodal.oracles),
    (aria.AriaQueries.queries, aria.AriaQueries.oracles),
    (streaming.StreamingQueries.queries, streaming.StreamingQueries.oracles),
    (sources.Formats.queries, sources.Formats.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
