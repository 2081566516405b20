package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Tables.{t, fanOut}
import graft.functions.Portable
import graft.Cache.CacheOps

/** Retrieval-style scoring and corpus-hygiene operators for a training-
  * data pipeline: TF-IDF term extraction, BM25 document ranking, PII
  * redaction, and train/test decontamination.
  *
  * Exactness: all scores avoid transcendentals (ln/log are not
  * bit-identical across libms). IDF is a RATIONAL surrogate — an
  * integer-scaled ratio computed with BIGINT integer division — so every
  * downstream double is derived from identical integers via IEEE
  * correctly-rounded ops in the same order in both engines.
  *
  * Scale: every pair/score path is an equi-join on a bounded key
  * (term, n-gram) over an inverted index, never all-pairs; per-doc maps
  * are embarrassingly parallel.
  */
object Retrieval {

  private val tokSql = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)"

  /** TF-IDF top terms per document. idf_scaled = (N * 1e6) DIV df
    * (integer division — exact in both engines); score = tf * idf_scaled.
    * Top-5 terms per doc by (score desc, term asc).
    *
    * Plan: tokenize+explode (map, fanned out off the 1-file scan) →
    * one shuffle to (doc_id, term) counts → term-level df agg (reuses the
    * tf frame, hard-materialized once) → broadcast scalar N → per-doc
    * top-k via a partitioned window (WindowGroupLimit pushes the k
    * filter into the partial sort at scale).
    */
  def tfidfTop(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tf = fanOut(docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")))
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .staged // feeds both df-agg and the score join
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("idf_scaled", expr("(n * 1000000) DIV df"))
      .withColumn("score", col("tf") * col("idf_scaled"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rn").cast("long").as("rn"))
      .orderBy("doc_id", "rn")
  }

  def tfidfTopSql(k: Int = 5): String =
    s"""WITH tf AS (
       |  SELECT doc_id, unnest($tokSql) AS term FROM documents
       |), tfc AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term
       |), dfc AS (
       |  SELECT term, count(*) AS df FROM tfc GROUP BY term
       |), n AS (SELECT count(*) AS n FROM documents),
       |scored AS (
       |  SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
       |         tfc.tf * ((n.n * 1000000) // dfc.df) AS score,
       |         (n.n * 1000000) // dfc.df AS idf_scaled
       |  FROM tfc JOIN dfc USING (term) CROSS JOIN n
       |), ranked AS (
       |  SELECT doc_id, term, tf, df, score,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
       |  FROM scored
       |)
       |SELECT doc_id, term, tf, df, score, rn::BIGINT AS rn
       |FROM ranked WHERE rn <= $k ORDER BY doc_id, rn""".stripMargin

  /** BM25 ranking of documents for a fixed conjunctive term query
    * (k1=1.2, b=0.75). The idf is the log-free rational surrogate
    * ((N-df)*2+1)*1e6 DIV (df*2+1) — monotone in the classic idf, and
    * integer-exact. Per-term partial scores are pivoted to COLUMNS and
    * added in a fixed left-to-right order (a plain SUM over term rows
    * would add doubles in engine-dependent order).
    *
    * Plan: term-filtered explode (the isin filter prunes before the
    * shuffle) → (doc,term) tf → broadcast 3-row df/N/avgdl → pivot →
    * global top-50 (TakeOrderedAndProject, no full sort at scale).
    */
  val bm25Terms: Seq[String] = Seq("spark", "vector", "join")

  def bm25Rank(spark: SparkSession, dir: String, topN: Int = 50): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tk = fanOut(docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
      .staged // feeds tf, N/avgdl, and the final join
    val stats = tk.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n"))
    val tf = tk.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(bm25Terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfc), "term")
      .join(tk.select("doc_id", "dl"), "doc_id")
      .crossJoin(broadcast(stats.select("n", "avgdl")))
      .withColumn("idf_scaled", expr("(((n - df) * 2 + 1) * 1000000) DIV (df * 2 + 1)"))
      .withColumn("s", col("idf_scaled").cast("double") * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
    val parts = bm25Terms.map(term =>
      coalesce(max(when(col("term") === term, col("s"))), lit(0.0)).as(s"s_$term"))
    scored.groupBy("doc_id").agg(parts.head, parts.tail: _*)
      .withColumn("score",
        bm25Terms.map(term => col(s"s_$term")).reduceLeft(_ + _))
      .orderBy(desc("score"), col("doc_id")).limit(topN)
  }

  def bm25RankSql(topN: Int = 50): String = {
    val termList = bm25Terms.map(s => s"'$s'").mkString("(", ", ", ")")
    val pivots = bm25Terms.map(term =>
      s"coalesce(max(CASE WHEN term = '$term' THEN s END), 0.0) AS s_$term")
      .mkString(",\n|         ")
    val total = bm25Terms.map(term => s"s_$term").mkString(" + ")
    s"""WITH tk AS (
       |  SELECT doc_id, $tokSql AS toks FROM documents
       |), dls AS (
       |  SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM tk
       |), stats AS (
       |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dls
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(toks) AS term FROM dls
       |  ) WHERE term IN $termList GROUP BY doc_id, term
       |), dfc AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), scored AS (
       |  -- fractional literals are cast to DOUBLE: a bare 2.2 is DECIMAL
       |  -- in DuckDB (exact 6.6 for tf*2.2) while Spark's lit(2.2) is the
       |  -- double 2.2000...018 — a 1-ulp divergence in the final score
       |  SELECT tf.doc_id, tf.term,
       |         CAST((((n - df) * 2 + 1) * 1000000) // (df * 2 + 1) AS DOUBLE)
       |           * (tf * 2.2::DOUBLE)
       |           / (tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)) AS s
       |  FROM tf JOIN dfc USING (term)
       |       JOIN dls USING (doc_id)
       |       CROSS JOIN stats
       |), piv AS (
       |  SELECT doc_id,
       |         $pivots
       |  FROM scored GROUP BY doc_id
       |)
       |SELECT doc_id, s_spark, s_vector, s_join, $total AS score
       |FROM piv ORDER BY score DESC, doc_id LIMIT $topN""".stripMargin
  }

  /** PII-style redaction over a synthesized event log line
    * (`user=<id> <props>`): mask every digit run, count the masked
    * spans, and fingerprint the redacted text. Pure per-row map stage —
    * at 100 TB this is one pass over the scan with only the three used
    * columns read. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        concat(lit("user="), col("user_id"), lit(" "), col("props")).as("log"))
      .select(
        col("event_id"),
        size(regexp_extract_all(col("log"), lit("[0-9]+"), lit(0)))
          .cast("long").as("n_masked"),
        md5(regexp_replace(col("log"), "[0-9]+", "#")).as("redacted_md5"),
        length(regexp_replace(col("log"), "[0-9]+", "#")).cast("long")
          .as("redacted_len"))
      .orderBy("event_id")

  val piiRedactSql: String =
    """WITH lg AS (
      |  SELECT event_id, 'user=' || user_id || ' ' || props AS log FROM events
      |)
      |SELECT event_id,
      |       len(regexp_extract_all(log, '[0-9]+'))::BIGINT AS n_masked,
      |       md5(regexp_replace(log, '[0-9]+', '#', 'g')) AS redacted_md5,
      |       length(regexp_replace(log, '[0-9]+', '#', 'g'))::BIGINT AS redacted_len
      |FROM lg ORDER BY event_id""".stripMargin

  /** Train/test decontamination: find test-split documents whose word
    * 8-grams also appear in train-split documents (the standard n-gram
    * membership check run before publishing a corpus). Splits are the
    * deterministic hash split of `text_split_assign`.
    *
    * Scale shape: distinct 8-grams per doc → inverted-index equi-join on
    * the gram between the test and train sides, with a document-frequency
    * cap (grams in > maxGramDf docs are boilerplate and excluded — same
    * rationale as the Jaccard stop-shingle cap; an f-doc gram fans out
    * O(f_test · f_train) rows otherwise). Never all-pairs.
    */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 8,
                    maxGramDf: Int = 100): DataFrame = {
    val grams = fanOut(t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")))
      .filter(size(col("toks")) >= n)
      .staged // barrier: keep the split() out of the per-index lambda
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j)): _*))))
        .as("gram"))
      .withColumn("split",
        when(TextAnalysis.splitHash(col("doc_id")) < 80, "train").otherwise("other"))
      .staged // feeds the df cap and both join sides
    val rare = grams.groupBy("gram").agg(countDistinct("doc_id").as("gdf"))
      .filter(col("gdf") <= maxGramDf).select("gram")
    val capped = grams.join(rare, "gram")
    val train = capped.filter(col("split") === "train")
      .select(col("gram"), col("doc_id").as("train_doc"))
    val test = capped.filter(col("split") === "other")
      .select(col("gram"), col("doc_id").as("test_doc"))
    test.join(train, "gram")
      .groupBy("test_doc")
      .agg(countDistinct("gram").as("n_shared_grams"),
        countDistinct("train_doc").as("n_train_docs"))
      .orderBy("test_doc")
  }

  def decontaminateSql(n: Int = 8, maxGramDf: Int = 100): String = {
    val gramExpr = (1 to n).map(j => s"toks[i+${j - 1}]").mkString(" || ' ' || ")
    s"""WITH tk AS (
       |  SELECT doc_id, $tokSql AS toks FROM documents
       |), grams AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_transform(
       |           generate_series(1, len(toks) - ${n - 1}), i -> $gramExpr))) AS gram,
       |         CASE WHEN ${TextAnalysis.splitHashSql} < 80
       |              THEN 'train' ELSE 'other' END AS split
       |  FROM tk WHERE len(toks) >= $n
       |), rare AS (
       |  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) <= $maxGramDf
       |), capped AS (SELECT g.* FROM grams g JOIN rare USING (gram))
       |SELECT te.doc_id AS test_doc,
       |       count(DISTINCT te.gram)::BIGINT AS n_shared_grams,
       |       count(DISTINCT tr.doc_id)::BIGINT AS n_train_docs
       |FROM capped te JOIN capped tr
       |  ON te.gram = tr.gram AND te.split = 'other' AND tr.split = 'train'
       |GROUP BY te.doc_id ORDER BY test_doc""".stripMargin
  }

  /** Document-frequency cap for the all-pairs similarity index, as a
    * CORPUS FRACTION: terms (word bigrams) present in more than 1/100th
    * of all documents are excluded. A term in f documents fans out
    * O(f²) pair rows, so the cap is what bounds the inverted-index join.
    * TWO conditions, each necessary (the round-13 8× full-board run is
    * the evidence):
    *  - the FRACTIONAL cap (df·100 ≤ n) is the semantic stop-term
    *    filter — it keeps exactly the discriminative tail at any scale
    *    (the excluded terms carry negligible idf weight anyway);
    *  - the ABSOLUTE ceiling (df ≤ [[dfCeiling]]) is the join-work
    *    bound the fractional cap alone does NOT give: df may grow to
    *    n/100, making worst-case per-term pair work (n/100)² —
    *    quadratic in the corpus. The 8× board measured exactly that:
    *    the fractional bound loosened 50 → 400, per-term pair work grew
    *    548× (1.07M → 585.6M products) and the query ran 40× — the one
    *    superlinear plan on the 313-query board. With the ceiling the
    *    pair stage is ≤ df_ceiling² per term — linear in term count.
    * This is the standard stop-term guard of Bayardo et al.'s all-pairs
    * similarity search; terms between the two bounds at web scale are
    * the lossy trade (prefix filtering is the lossless alternative). */
  val maxDfDivisor = 100

  /** Absolute df ceiling — equals the fractional bound at sf0.1
    * (n=5000 → 50), so harness results are unchanged at every verify
    * SF; it binds only when the corpus grows. */
  val dfCeiling = 50

  /** All-pairs document cosine similarity over TF-IDF unit vectors —
    * the lexical analog of the embedding near-dup path: sparse vectors
    * meet through an inverted-index equi-join on shared terms (never a
    * cross product), and each shared term contributes one product to
    * the pair's dot. Terms are word BIGRAMS: the harness vocabulary is
    * ~31 words, so unigram df is always a large corpus fraction —
    * bigrams give a ~900-term space with a discriminative rare tail
    * (real corpora have that tail at the unigram level already).
    *
    * Exactness: weights w = tf · ((N·100) DIV df) stay integral
    * (BIGINT-safe at harness N; at web scale the idf would be bucketed
    * into integer classes instead), per-doc norms are exact integer
    * sums, and the unit vectors are fixed-point quantized at 1e4 — the
    * Portable.quantize convention — so dots and cosines are identical
    * doubles in both engines.
    *
    * Scale: two shuffles ((doc, term) counts, then the pair groupBy);
    * the fractional df cap bounds the inverted-index fanout. */
  def cosinePairs(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tf = fanOut(docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")))
      // hard-materialize toks: an inlined tokenizer re-runs per
      // element_at inside the bigram lambda (see Dedup.shingleTable)
      .staged
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, size(toks) - 1), " +
          "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .staged // feeds df-agg and the weight join
    val n = docs.agg(count(lit(1)).as("n"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df") * maxDfDivisor <= col("n") && col("df") <= dfCeiling)
    val w = tf.join(df, "term")
      .withColumn("w", col("tf") * expr("(n * 100) DIV df"))
    val nsq = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("nsq"))
    val u = w.join(nsq, "doc_id")
      .withColumn("u",
        floor(col("w").cast("double") / sqrt(col("nsq").cast("double")) * 10000d + 0.5d)
          .cast("long"))
      .select("doc_id", "term", "u")
      .staged // quantized index feeds norms and both join sides
    val qn = u.groupBy("doc_id").agg(sum(col("u") * col("u")).as("qn"))
    val pairs = u.select(col("doc_id").as("a"), col("term"), col("u").as("ua"))
      .join(u.select(col("doc_id").as("b"), col("term"), col("u").as("ub")), Seq("term"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(sum(col("ua") * col("ub")).as("dot"))
    pairs
      .join(qn.select(col("doc_id").as("a"), col("qn").as("qa")), Seq("a"))
      .join(qn.select(col("doc_id").as("b"), col("qn").as("qb")), Seq("b"))
      .withColumn("cosine", col("dot").cast("double") /
        (sqrt(col("qa").cast("double")) * sqrt(col("qb").cast("double"))))
      .filter(col("cosine") >= tau)
      .select(col("a"), col("b"), col("cosine"))
      .orderBy("a", "b")
  }

  def cosinePairsSql(tau: Double = 0.5): String =
    s"""WITH tk AS (
       |  SELECT doc_id, $tokSql AS toks FROM documents
       |), tf0 AS (
       |  SELECT doc_id,
       |         unnest(list_transform(generate_series(1, len(toks) - 1),
       |                               i -> toks[i] || ' ' || toks[i+1])) AS term
       |  FROM tk WHERE len(toks) >= 2
       |), tfc AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tf0 GROUP BY doc_id, term
       |), n AS (SELECT count(*) AS n FROM documents),
       |dfc AS (
       |  SELECT term, count(*) AS df FROM tfc GROUP BY term
       |  HAVING count(*) * $maxDfDivisor <= (SELECT n FROM n)
       |     AND count(*) <= $dfCeiling
       |),
       |w AS (
       |  SELECT doc_id, term, tf * ((n.n * 100) // df) AS w
       |  FROM tfc JOIN dfc USING (term) CROSS JOIN n
       |), nsq AS (
       |  SELECT doc_id, sum(w * w) AS nsq FROM w GROUP BY doc_id
       |), u AS (
       |  SELECT w.doc_id, term,
       |         CAST(floor(CAST(w AS DOUBLE) / sqrt(CAST(nsq.nsq AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS u
       |  FROM w JOIN nsq ON w.doc_id = nsq.doc_id
       |), qn AS (
       |  SELECT doc_id, sum(u * u) AS qn FROM u GROUP BY doc_id
       |), pairs AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b, sum(l.u * r.u) AS dot
       |  FROM u l JOIN u r ON l.term = r.term AND l.doc_id < r.doc_id
       |  GROUP BY a, b
       |)
       |SELECT a, b,
       |       CAST(dot AS DOUBLE) / (sqrt(CAST(qa.qn AS DOUBLE)) * sqrt(CAST(qb.qn AS DOUBLE))) AS cosine
       |FROM pairs JOIN qn qa ON pairs.a = qa.doc_id
       |           JOIN qn qb ON pairs.b = qb.doc_id
       |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(qa.qn AS DOUBLE)) * sqrt(CAST(qb.qn AS DOUBLE))) >= $tau
       |ORDER BY a, b""".stripMargin

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009):
    * fuse the lexical arm ([[bm25Rank]] top-N for the fixed term query)
    * with a vector arm (cosine of every embedding against the vec_id-0
    * query vector, top-N) by summing 1/(k0+rank) over the arms a
    * document appears in. The contribution is computed as the scaled
    * integer 1e9 DIV (k0+rank) so the fused score is BIGINT-exact in
    * both engines (no float rank reciprocals to diverge).
    *
    * Plan: each arm ends in a bounded global top-N
    * (TakeOrderedAndProject — never a full sort of the corpus), the
    * rank row_number windows run over those ≤N-row frames (bounded, so
    * the unpartitioned window is safe at any corpus size), and the
    * fusion is a full-outer join of two ≤N-row sets. At 100 TB the
    * corpus cost is one BM25 scoring pass + one embedding scoring pass;
    * everything after is O(N). */
  def rrfFusion(spark: SparkSession, dir: String, topN: Int = 50, k0: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25Rank(spark, dir, topN)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(desc("score"), col("doc_id")))
          .cast("long").as("lex_rank"))
    val qn = t(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), Portable.quantize(col("embedding")).as("q"))
      .withColumn("nsq", Portable.normSqQ(col("q")))
    val q0 = qn.filter(col("vec_id") === 0)
      .select(col("q").as("qa"), col("nsq").as("na"))
    val vecTop = qn.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q0)) // 1-row query vector
      .withColumn("cosine",
        Portable.dotQ(col("qa"), col("q")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nsq").cast("double"))))
      .select(col("vec_id").as("doc_id"), col("cosine"))
      .orderBy(desc("cosine"), col("doc_id")).limit(topN)
    val vec = vecTop.select(col("doc_id"),
      row_number().over(Window.orderBy(desc("cosine"), col("doc_id")))
        .cast("long").as("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        (coalesce(expr(s"1000000000 DIV ($k0 + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000 DIV ($k0 + vec_rank)"), lit(0L))).as("rrf_score"))
      .orderBy(desc("rrf_score"), col("doc_id"))
  }

  def rrfFusionSql(topN: Int = 50, k0: Int = 60): String =
    s"""WITH lexbase AS (SELECT doc_id, score FROM (${bm25RankSql(topN)})),
       |lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
       |  FROM lexbase),
       |q AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |qn AS (
       |  SELECT vec_id, qv,
       |         CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
       |  FROM q),
       |q0 AS (SELECT qv, nsq FROM qn WHERE vec_id = 0),
       |vscore AS (
       |  SELECT b.vec_id AS doc_id,
       |         CAST(list_sum(list_transform(generate_series(1, 64), i -> a.qv[i] * b.qv[i])) AS BIGINT)::DOUBLE
       |           / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
       |  FROM qn b, q0 a WHERE b.vec_id <> 0),
       |vectop AS (SELECT doc_id, cosine FROM vscore ORDER BY cosine DESC, doc_id LIMIT $topN),
       |vec AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS vec_rank
       |  FROM vectop)
       |SELECT doc_id, lex_rank, vec_rank,
       |       CAST(coalesce(1000000000 // ($k0 + lex_rank), 0)
       |          + coalesce(1000000000 // ($k0 + vec_rank), 0) AS BIGINT) AS rrf_score
       |FROM lex FULL JOIN vec USING (doc_id)
       |ORDER BY rrf_score DESC, doc_id""".stripMargin

  /** Per-document n-gram novelty: the share of a document's DISTINCT
    * bigrams that occur in no other document — the inverse of the
    * repetition/boilerplate signals (a high score marks genuinely novel
    * content worth keeping; a near-zero score marks template text even
    * when no single near-duplicate partner exists, which is exactly the
    * case pairwise dedup misses).
    *
    * Grams are carried as their portable 60-bit hash, not the string —
    * the shuffle key is fixed 8 bytes regardless of token length, and
    * any hash collision merges the same grams in BOTH engines, so the
    * oracle stays exact. Shapes: distinct (doc, gram-hash) one shuffle;
    * gram-frequency partial+final count on the hash; the join back is
    * on the same key (exchange-aligned); final per-doc agg. The classic
    * inverted-index chain — never all-pairs, never a corpus-wide
    * array. Docs with < 2 tokens have no bigrams and are excluded
    * (same rule as the DSIR featurizer). */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    ngramNoveltyFrom(fanOut(t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))))

  /** Core on any (doc_id, toks) frame — see [[ngramNovelty]]. */
  private[graft] def ngramNoveltyFrom(docs: DataFrame): DataFrame = {
    val pairs = docs
      .filter(size(col("toks")) >= 2)
      .staged // barrier: keep split() out of the per-index lambda
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => Portable.hash60(concat(lit("nov_"), element_at(col("toks"), i),
            lit("_"), element_at(col("toks"), i + 1))))))
        .as("g"))
      .staged // feeds the df agg and the join side
    val gdf = pairs.groupBy("g").agg(count(lit(1)).as("gdf"))
    pairs.join(gdf, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty_permille", expr("(1000 * n_unique) div n_grams"))
      .orderBy("doc_id")
  }

  val ngramNoveltySql: String =
    s"""WITH tk AS (
       |  SELECT doc_id, $tokSql AS toks FROM documents
       |), pairs AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_transform(generate_series(1, len(toks) - 1),
       |           i -> ('0x' || substr(md5('nov_' || toks[i] || '_' || toks[i+1]), 1, 15))::BIGINT)))
       |           AS g
       |  FROM tk WHERE len(toks) >= 2
       |), gdf AS (
       |  SELECT g, count(*) AS gdf FROM pairs GROUP BY 1
       |)
       |SELECT doc_id, count(*) AS n_grams,
       |       CAST(sum(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       |       CAST((1000 * sum(CASE WHEN gdf = 1 THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
       |         AS novelty_permille
       |FROM pairs JOIN gdf USING (g)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tfidf_top" -> ((s, d) => tfidfTop(s, d)),
    "text_bm25_rank" -> ((s, d) => bm25Rank(s, d)),
    "text_pii_redact" -> piiRedact,
    "text_cosine_pairs" -> ((s, d) => cosinePairs(s, d)),
    "text_ngram_novelty" -> ngramNovelty,
    "retrieval_rrf_fusion" -> ((s, d) => rrfFusion(s, d)),
    "dedup_decontaminate" -> ((s, d) => decontaminate(s, d)))

  val oracles: Map[String, String] = Map(
    "text_tfidf_top" -> tfidfTopSql(),
    "text_bm25_rank" -> bm25RankSql(),
    "text_pii_redact" -> piiRedactSql,
    "text_cosine_pairs" -> cosinePairsSql(),
    "text_ngram_novelty" -> ngramNoveltySql,
    "retrieval_rrf_fusion" -> rrfFusionSql(),
    "dedup_decontaminate" -> decontaminateSql())
}
