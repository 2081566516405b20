package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Tables.t
import graft.Cache.CacheOps

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
  * Scale: training state is the DISTINCT WORD-FORM table with corpus
  * counts (the standard Sennrich formulation) — Zipf: orders of
  * magnitude smaller than the corpus. Pair statistics are
  * count-weighted aggregations over that form table (identical totals
  * to occurrence-level counting, so the learned merges are the same —
  * the DuckDB oracle deliberately stays occurrence-level, making the
  * correctness gate a proof of that equivalence), each round's rewrite
  * is a per-form-row fold, and the learned merges are applied to
  * occurrences ONCE at the end via a single (doc_id, w) ⋈ form join.
  * Per-round state and checkpoint cost are O(|word forms|), not
  * O(corpus × rounds); each round's form table is lazily checkpointed
  * so the K-round loop doesn't snowball lineage (same pattern as
  * PageRank's fixed-K rounds).
  */
object Bpe {

  /** Learning rounds (= merges learned). Fixed so the DuckDB oracle can
    * unroll the loop as CTEs. */
  val rounds = 6

  /** Per-document token counts under `rounds` learned merges:
    * (doc_id, n_words, n_chars, n_bpe_tokens).
    *
    * Each round, over the DISTINCT form table (w, wcnt, syms):
    * (1) adjacent-pair frequencies weighted by `wcnt` — explode each
    * form's (sym, nxt) pairs, one partial+final groupBy whose key
    * space is the vocabulary; weighting by corpus count makes the
    * totals identical to occurrence-level counting, so the learned
    * merges are the same; (2) the argmax pair (count desc, then
    * lexicographic — a total order, so both engines learn the same
    * merge) as a 0-or-1-row broadcast LEFT-joined onto the forms (left,
    * not cross: if NO pair qualifies — every form single-symbol or only
    * sym==nxt pairs remain — bx/by come through null, every rewrite
    * comparison with null falls to the keep-symbol branch, and the
    * round is a no-op instead of annihilating the table — the
    * degenerate-input guard, kept declarative so all 6 rounds share ONE
    * generated-code shape: inlining bx/by as collected literals was
    * measured to force a fresh whole-stage-codegen compile per round
    * and per cache eviction, ~1-2 s each); (3) the rewrite — a
    * left-to-right fold over each form's symbol array that replaces
    * [.., bx] + by with [.., bx·by]. Because bx ≠ by, matches can never
    * overlap, so the sequential fold IS the simultaneous rewrite (the
    * oracle's windowed occurrence-level form — lead/lag over symbol
    * rows — is kept in SQL and the correctness gate proves the
    * equivalence every round). */
  def bpeCounts(spark: SparkSession, dir: String): DataFrame =
    bpeCountsFrom(t(spark, dir, "documents"))

  /** One round's count-weighted adjacent-pair statistics over a form
    * table (w, wcnt, syms): the ONLY per-round shuffle, keyed on the
    * (sym, nxt) VOCABULARY — never on doc_id or the corpus.
    * Package-visible so PlanShapeSpec can pin that property. */
  private[graft] def pairStats(forms: DataFrame): DataFrame =
    forms
      .filter(size(col("syms")) >= 2)
      .select(col("wcnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS sym, syms[i] AS nxt))")).as("p"))
      .select(col("p.sym").as("sym"), col("p.nxt").as("nxt"), col("wcnt"))
      .filter(col("sym") =!= col("nxt"))
      .groupBy("sym", "nxt").agg(sum(col("wcnt")).as("cnt"))

  /** Core on any (doc_id, text) frame — see [[bpeCounts]]. */
  private[graft] def bpeCountsFrom(docs: DataFrame): DataFrame = {
    // occurrences folded to (doc_id, w, occ): one corpus shuffle, read
    // twice (form derivation + final application join)
    val occ = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("occ"))
      .staged
    // training state: distinct word forms with corpus counts (Zipf-small)
    // merge-round loop state: lineage cut per round is the point (round
    // k's plan must not nest all rounds < k), so `forms` stays
    // localCheckpoint under every Cache mode — see graft.Cache
    var forms = occ.groupBy("w").agg(sum(col("occ")).as("wcnt"))
      .select(col("w"), col("wcnt"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
      .localCheckpoint(false)
    // null-safe: with bx/by null (empty `best`), both `when` predicates
    // are null → every symbol takes the keep branch → round is a no-op
    val rewrite = expr(
      """aggregate(syms, cast(array() as array<string>),
        |  (acc, s) -> case
        |    when size(acc) = 0 then array(s)
        |    when element_at(acc, -1) = bx and s = by
        |      then concat(slice(acc, 1, size(acc) - 1), array(concat(bx, by)))
        |    else concat(acc, array(s)) end)""".stripMargin)
    for (_ <- 1 to rounds) {
      val best = pairStats(forms)
        .orderBy(desc("cnt"), col("sym"), col("nxt")).limit(1)
        .select(col("sym").as("bx"), col("nxt").as("by"))
      forms = forms.join(broadcast(best), lit(true), "left")
        .select(col("w"), col("wcnt"), rewrite.as("syms"))
        .localCheckpoint(false)
    }
    // apply the learned vocabulary ONCE: occurrences ⋈ rewritten forms.
    // Explicit broadcast: the checkpointed form table carries no stats
    // (sizeInBytes defaults to huge), so the hint — not the optimizer —
    // keeps the vocabulary on the small side of the join.
    occ.join(broadcast(forms.select(col("w"), size(col("syms")).cast("long").as("w_tokens"),
        length(col("w")).cast("long").as("w_chars"))), Seq("w"))
      .groupBy("doc_id")
      .agg(sum(col("occ")).as("n_words"),
        sum(col("occ") * col("w_chars")).cast("long").as("n_chars"),
        sum(col("occ") * col("w_tokens")).cast("long").as("n_bpe_tokens"))
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
