package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable
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

  /** Deterministic sequence packing: assign documents to fixed
    * token-budget training chunks (the step that turns a curated corpus
    * into context-window-sized examples). Distributed shape: documents
    * are hash-assigned to one of [[PackShards]] independent packer
    * shards (a pure function of doc_id — stable across runs and
    * backfills), each shard packs its documents in doc_id order by
    * cumulative token offset, and a chunk is `start_offset div budget`
    * (documents may straddle a boundary; the chunk owns the doc whose
    * first token falls inside it). One map + one window partitioned by
    * shard + one aggregate on the SAME key — a single shuffle end to
    * end, never a global sort/window. At cluster scale the shard count
    * is sized to executors (it is the packing parallelism); 8 here
    * keeps sf-fixture chunks non-trivial.
    */
  val PackShards = 8
  val PackBudget = 512L

  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
        Portable.hashMod(concat(lit("pack_"), col("doc_id").cast("string")),
          PackShards).as("shard"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .groupBy(col("shard"), expr(s"start_off div $PackBudget").as("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
  }

  val packSequencesSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         len(${TextAnalysis.tokSql})::BIGINT AS n_tok,
       |         ('0x' || substr(md5('pack_' || doc_id), 1, 15))::BIGINT % $PackShards AS shard
       |  FROM documents
       |), off AS (
       |  -- DuckDB windowed sum(BIGINT) is HUGEINT; chunk_id must stay BIGINT
       |  SELECT shard, n_tok,
       |         CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM toks
       |)
       |SELECT shard, start_off // $PackBudget AS chunk_id,
       |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |FROM off GROUP BY 1, 2""".stripMargin

  /** Deterministic language-mixture resampling: upsample every language
    * to token parity with the largest one, capped at 4× (the
    * temperature-style rebalancing run before multilingual training).
    * The replication ratio is integer permille `min(4000,
    * tmax*1000 div t_lang)`; each document is emitted `r div 1000`
    * times plus one more when its hash-fraction falls below the
    * fractional part — a pure function of doc_id, so the resample is
    * reproducible and shard-independent. Dataflow: one tiny per-lang
    * aggregate (5 rows) broadcast back onto the corpus, then one final
    * per-lang aggregate — the corpus is touched by maps only.
    * `greatest(t,1)` guards the all-empty-language degenerate case
    * (divide-by-zero under ANSI) without changing any real ratio.
    */
  def mixResample(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
    val tot = toks.groupBy("lang").agg(sum("n_tok").as("t"))
    val mx = tot.agg(max("t").as("tmax"))
    val rl = tot.crossJoin(broadcast(mx))
      .select(col("lang"),
        least(lit(4000L), expr("(tmax * 1000) div greatest(t, 1)")).as("r"))
    toks.join(broadcast(rl), "lang")
      .withColumn("k", expr("r div 1000") +
        when(pmod(Portable.hash60(concat(lit("mix_"), col("doc_id").cast("string"))),
          lit(1000L)) < pmod(col("r"), lit(1000L)), lit(1L)).otherwise(lit(0L)))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs_in"), sum("n_tok").as("tokens_in"),
        min("r").as("repl_permille"),
        sum("k").as("docs_out"), sum(col("k") * col("n_tok")).as("tokens_out"))
  }

  val mixResampleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, len(${TextAnalysis.tokSql})::BIGINT AS n_tok
       |  FROM documents
       |), tot AS (
       |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS t FROM toks GROUP BY 1
       |), mx AS (
       |  SELECT CAST(max(t) AS BIGINT) AS tmax FROM tot
       |), rl AS (
       |  SELECT lang, least(4000, (tmax * 1000) // greatest(t, 1)) AS r
       |  FROM tot, mx
       |), j AS (
       |  SELECT d.lang, d.n_tok, rl.r,
       |         rl.r // 1000 + CASE WHEN ('0x' || substr(md5('mix_' || d.doc_id), 1, 15))::BIGINT % 1000
       |                                  < rl.r % 1000 THEN 1 ELSE 0 END AS k
       |  FROM toks d JOIN rl USING (lang)
       |)
       |SELECT lang, count(*) AS docs_in, CAST(sum(n_tok) AS BIGINT) AS tokens_in,
       |       CAST(min(r) AS BIGINT) AS repl_permille,
       |       CAST(sum(k) AS BIGINT) AS docs_out,
       |       CAST(sum(k * n_tok) AS BIGINT) AS tokens_out
       |FROM j GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curation" -> curationFunnel,
    "pipeline_pack_sequences" -> packSequences,
    "pipeline_mix_resample" -> mixResample)

  val oracles: Map[String, String] = Map(
    "pipeline_curation" -> curationFunnelSql,
    "pipeline_pack_sequences" -> packSequencesSql,
    "pipeline_mix_resample" -> mixResampleSql)
}
