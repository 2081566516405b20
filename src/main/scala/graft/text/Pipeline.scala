package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Tables.t

/** The end-to-end corpus-curation pipeline, composed from the
  * already-verified stages: language filter → quality filter → exact
  * dedup (min-id per content hash) → LSH near-dup removal → split
  * assignment, reported as a retention funnel (stage, surviving docs,
  * surviving chars).
  *
  * This is the query a training-data team actually runs: every stage is
  * one of the first-class operators (langId, tokenCounts/qualityScore,
  * exact hash-dedup, the banded-minhash candidate join, the hash
  * split), chained on doc_id equi-joins — so the whole funnel keeps the
  * per-stage 100 TB shapes (map-stage filters, one content-hash
  * shuffle, the bucketed LSH candidate join; never all-pairs).
  *
  * Near-dup rule (deterministic, engine-mirrored): a doc is dropped if
  * it is the LARGER id of any LSH candidate pair whose smaller id
  * survived the pre-near-dup stages — the greedy keep-smallest policy.
  */
object Pipeline {

  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("nc"))
      .localCheckpoint(false) // every stage and the funnel reference it
    val keepLang = TextAnalysis.langId(spark, dir)
      .filter(col("pred_lang") =!= "unknown").select("doc_id")
    val s1 = base.join(keepLang, "doc_id").localCheckpoint(false)
    val keepTokens = TextAnalysis.tokenCounts(spark, dir)
      .filter(col("n_tokens") >= 10).select("doc_id")
    val keepQuality = TextAnalysis.qualityScore(spark, dir)
      .filter(col("repetition_ratio") < 0.5).select("doc_id")
    val s2 = s1.join(keepTokens, "doc_id").join(keepQuality, "doc_id")
      .localCheckpoint(false)
    val keepers = s2.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val s3 = s2.join(keepers, Seq("doc_id"), "left_semi").localCheckpoint(false)
    val cand = graft.dedup.Dedup.minhashCandidates(spark, dir)
    val dropped = cand
      .join(s3.select(col("doc_id").as("a")), Seq("a"), "left_semi")
      .select(col("b").as("doc_id")).distinct()
    val s4 = s3.join(dropped, Seq("doc_id"), "left_anti").localCheckpoint(false)
    val withSplit = s4.select(col("nc"),
      TextAnalysis.splitOf(col("doc_id")).as("split"))
    def stageRow(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), coalesce(sum("nc"), lit(0L)).as("n_chars"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_chars"))
    val funnel = Seq(
      stageRow("0_input", base), stageRow("1_lang", s1),
      stageRow("2_quality", s2), stageRow("3_exact_dedup", s3),
      stageRow("4_neardup", s4)).reduce(_ unionAll _)
    val splitRows = withSplit.groupBy("split")
      .agg(count(lit(1)).as("n_docs"), coalesce(sum("nc"), lit(0L)).as("n_chars"))
      .select(concat(lit("5_"), col("split")).as("stage"), col("n_docs"), col("n_chars"))
    funnel.unionAll(splitRows).orderBy("stage")
  }

  private def asCte(sql: String): String =
    sql.replace("ORDER BY doc_id, band", "").replace("ORDER BY doc_id", "")

  val curationFunnelSql: String = {
    val lang = asCte(TextAnalysis.langIdSql)
    val tc = asCte(TextAnalysis.tokenCountsSql)
    val q = asCte(TextAnalysis.qualityScoreSql)
    val cand = asCte(graft.dedup.Dedup.minhashCandidatesSql)
    s"""WITH base AS (
       |  SELECT doc_id, text, length(text)::BIGINT AS nc FROM documents
       |), s1 AS (
       |  SELECT base.* FROM base
       |  JOIN (SELECT doc_id FROM ($lang) WHERE pred_lang <> 'unknown') kl USING (doc_id)
       |), s2 AS (
       |  SELECT s1.* FROM s1
       |  JOIN (SELECT doc_id FROM ($tc) WHERE n_tokens >= 10) kt USING (doc_id)
       |  JOIN (SELECT doc_id FROM ($q) WHERE repetition_ratio < 0.5) kq USING (doc_id)
       |), s3 AS (
       |  SELECT s2.* FROM s2
       |  WHERE doc_id IN (SELECT min(doc_id) FROM s2 GROUP BY md5(text))
       |), cand AS (
       |  SELECT * FROM ($cand)
       |), dropped AS (
       |  SELECT DISTINCT c.b AS doc_id FROM cand c
       |  WHERE c.a IN (SELECT doc_id FROM s3)
       |), s4 AS (
       |  SELECT s3.* FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
       |), sp AS (
       |  SELECT nc,
       |         CASE WHEN ${TextAnalysis.splitHashSql} < 80 THEN 'train'
       |              WHEN ${TextAnalysis.splitHashSql} < 90 THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM s4
       |)
       |SELECT * FROM (
       |  SELECT '0_input' AS stage, count(*) AS n_docs, CAST(coalesce(sum(nc), 0) AS BIGINT) AS n_chars FROM base
       |  UNION ALL SELECT '1_lang', count(*), CAST(coalesce(sum(nc), 0) AS BIGINT) FROM s1
       |  UNION ALL SELECT '2_quality', count(*), CAST(coalesce(sum(nc), 0) AS BIGINT) FROM s2
       |  UNION ALL SELECT '3_exact_dedup', count(*), CAST(coalesce(sum(nc), 0) AS BIGINT) FROM s3
       |  UNION ALL SELECT '4_neardup', count(*), CAST(coalesce(sum(nc), 0) AS BIGINT) FROM s4
       |  UNION ALL SELECT '5_' || split, count(*), CAST(coalesce(sum(nc), 0) AS BIGINT) FROM sp GROUP BY split
       |)
       |ORDER BY stage""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curation" -> curationFunnel)

  val oracles: Map[String, String] = Map(
    "pipeline_curation" -> curationFunnelSql)
}
