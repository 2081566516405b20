package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Tables.t

/** Byte-pair-encoding-style tokenization as pure distributed dataflow —
  * LEARNED merges, not a heuristic: the real BPE training loop
  * (Sennrich et al. 2016) run for a fixed number of rounds, then
  * per-document token counts under the learned vocabulary.
  *
  * One merge round, relationally:
  *  1. adjacent-pair frequencies corpus-wide: a lead() over each word's
  *     symbol sequence + one groupBy(sym, nxt) shuffle;
  *  2. the argmax pair (count desc, then lexicographic — a total order,
  *     so both engines pick the same pair) as a 1-row broadcast;
  *  3. simultaneous rewrite: rows starting a match become the merged
  *     symbol, rows consumed by the match drop out. Merges of a symbol
  *     with ITSELF are excluded from vocabulary learning — with x ≠ y
  *     matches can never overlap, so the whole round is one windowed
  *     projection with no sequential scan (the documented deviation
  *     from run-greedy BPE, which must arbitrate overlapping "aaa"
  *     matches).
  *
  * Scale: symbols are (doc, word, pos) rows — rewrites are per-word
  * windows (bounded partitions), pair counting is one partial+final
  * aggregation, and each round's state is lazily checkpointed so the
  * K-round loop doesn't snowball lineage (same pattern as PageRank's
  * fixed-K rounds). Pair statistics at 100 TB concentrate on the
  * (sym, nxt) key — vocabulary-sized, not corpus-sized.
  */
object Bpe {

  /** Learning rounds (= merges learned). Fixed so the DuckDB oracle can
    * unroll the loop as CTEs. */
  val rounds = 6

  private def symbolTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      // hard projection barrier — see Dedup.shingleTable (an inlined
      // tokenizer re-runs per element_at inside the char lambda)
      .localCheckpoint(false)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("wid", "w")))
      .select(col("doc_id"), col("wid"),
        posexplode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
          .as(Seq("pos", "sym")))

  /** Per-document token counts under `rounds` learned merges:
    * (doc_id, n_words, n_chars, n_bpe_tokens). */
  def bpeCounts(spark: SparkSession, dir: String): DataFrame = {
    val perWord = Window.partitionBy("doc_id", "wid").orderBy("pos")
    var syms = symbolTable(spark, dir).localCheckpoint(false)
    val nChars = syms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chars"),
        (max("wid") + 1).cast("long").as("n_words"))
    for (_ <- 1 to rounds) {
      // one checkpoint per round, on the WINDOWED frame: it feeds both
      // the pair-statistics aggregate and the rewrite, which would
      // otherwise each re-run the window (and its shuffle)
      val pairs = syms
        .withColumn("nxt", lead("sym", 1).over(perWord))
        .withColumn("prv", lag("sym", 1).over(perWord))
        .localCheckpoint(false)
      val best = pairs
        .filter(col("nxt").isNotNull && col("sym") =!= col("nxt"))
        .groupBy("sym", "nxt").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("sym"), col("nxt")).limit(1)
        .select(col("sym").as("bx"), col("nxt").as("by"))
      syms = pairs.crossJoin(broadcast(best))
        // drop rows consumed by the merge starting one position left
        .filter(not(coalesce(col("prv") === col("bx") && col("sym") === col("by"),
          lit(false))))
        .select(col("doc_id"), col("wid"), col("pos"),
          when(col("sym") === col("bx") && coalesce(col("nxt") === col("by"), lit(false)),
            concat(col("sym"), col("nxt"))).otherwise(col("sym")).as("sym"))
    }
    syms.groupBy("doc_id").agg(count(lit(1)).as("n_bpe_tokens"))
      .join(nChars, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  private val tokSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)"

  val bpeCountsSql: String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT doc_id, wid, pos, sym,
         |         lead(sym) OVER (PARTITION BY doc_id, wid ORDER BY pos) AS nxt,
         |         lag(sym)  OVER (PARTITION BY doc_id, wid ORDER BY pos) AS prv
         |  FROM s${r - 1}),
         |b$r AS (
         |  SELECT sym AS bx, nxt AS by FROM p$r
         |  WHERE nxt IS NOT NULL AND sym <> nxt
         |  GROUP BY sym, nxt ORDER BY count(*) DESC, sym, nxt LIMIT 1),
         |s$r AS MATERIALIZED (
         |  SELECT doc_id, wid, pos,
         |         CASE WHEN sym = b.bx AND coalesce(nxt = b.by, FALSE)
         |              THEN sym || nxt ELSE sym END AS sym
         |  FROM p$r, b$r b
         |  WHERE NOT coalesce(prv = b.bx AND sym = b.by, FALSE))""".stripMargin
    }.mkString(",\n")
    s"""WITH tk AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |words AS (
       |  SELECT doc_id, u.i - 1 AS wid, toks[u.i] AS w
       |  FROM tk, unnest(generate_series(1, len(toks))) AS u(i)),
       |s0 AS MATERIALIZED (
       |  SELECT doc_id, wid, v.i - 1 AS pos, w[v.i] AS sym
       |  FROM words, unnest(generate_series(1, length(w))) AS v(i)),
       |$roundCtes,
       |base AS (
       |  SELECT doc_id, count(*) AS n_chars,
       |         CAST(max(wid) + 1 AS BIGINT) AS n_words
       |  FROM s0 GROUP BY doc_id)
       |SELECT s.doc_id, base.n_words, base.n_chars, count(*) AS n_bpe_tokens
       |FROM s$rounds s JOIN base ON s.doc_id = base.doc_id
       |GROUP BY s.doc_id, base.n_words, base.n_chars
       |ORDER BY s.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_counts" -> bpeCounts)

  val oracles: Map[String, String] = Map(
    "text_bpe_counts" -> bpeCountsSql)
}
