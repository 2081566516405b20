package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Tables.t
import graft.functions.Portable
import graft.text.TextAnalysis
import graft.Cache.CacheOps

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design (the point of each algorithm):
  *  - exact: one shuffle on the content hash — embarrassingly scalable.
  *  - MinHash+LSH: signatures are a per-row map; banding turns the O(n²)
  *    pair problem into an equi-join on (band, bucket) — only docs sharing
  *    a band bucket ever meet. At 100 TB the bucket join is the only
  *    shuffle, and bucket sizes are bounded w.h.p.
  *  - SimHash: per-row 60-bit signature; near-pair search equi-joins on
  *    15-bit signature pieces — by pigeonhole any pair within Hamming ≤ 3
  *    shares one of the 4 pieces — then verifies with bit_count. Never a
  *    cross join, and the (position, piece) candidate key has 4 × 2^15
  *    values, so bucket population SHRINKS relative to corpus size as the
  *    signature space is filled — unlike a fixed-cardinality 8-bit piece
  *    key, which would make the candidate join quadratic at web scale.
  *  - n-gram Jaccard: inverted-index join on shared shingles (never the
  *    full cross product), then exact Jaccard from intersection counts.
  *
  * Everything is built from codegen'd built-ins on the portable md5-based
  * hash (Portable.hash60) so the DuckDB oracle reproduces results exactly.
  */
object Dedup {

  private val tokSql = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)"

  /** Word 3-gram shingles, distinct, from an ALREADY-MATERIALIZED token
    * array column. The column must be concrete (come through an exchange
    * or checkpoint): if `toks` is an inline alias of `split(...)`,
    * CollapseProject inlines it into every `element_at` lambda call and
    * the split re-runs per element — quadratic blowup (measured 40×
    * slowdown on the shingle pipeline). */
  private def shingles(toks: Column): Column =
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array(concat_ws(" ", toks))))

  private val shinglesSql: String =
    """list_distinct(CASE WHEN len(toks) >= 3
      |    THEN list_transform(generate_series(1, len(toks) - 2),
      |                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |    ELSE [array_to_string(toks, ' ')] END)""".stripMargin

  /** Session-scoped memo of the family's shared input frames (the
    * staged token corpus and its CJK variant), keyed `"<dir>|<form>"`
    * — optimization r16: a dozen dedup queries each re-paid the scan +
    * tokenize + exchange + materialization of the SAME (doc_id, toks)
    * frame per query (the stage the 12s-vs-1s note below pins as the
    * family's critical path). Same memo shape as [[rareCache]]; Bench
    * evicts via [[evictPairs]] between passes. */
  private val frameCache =
    new java.util.HashMap[SparkSession, Map[String, DataFrame]]

  private def memoFrame(spark: SparkSession, key: String)
                       (build: => DataFrame): DataFrame =
    frameCache.synchronized {
      frameCache.keySet.removeIf(s => s.sparkContext.isStopped)
      val per = frameCache.getOrDefault(spark, Map.empty)
      per.get(key) match {
        case Some(df) => df
        case None =>
          val df = build
          frameCache.put(spark, per + (key -> df))
          df
      }
    }

  /** Tokenized corpus (doc_id, toks), staged — the shared prefix of
    * every shingle/gram consumer and the hard projection barrier every
    * position-exploding consumer needs. Repartition first: the harness
    * tables are single parquet files (one scan partition), which would
    * serialize the tokenize map stage; at production scale the source
    * has natural splits and this is a no-op-equivalent. */
  private def tokensFrame(spark: SparkSession, dir: String): DataFrame =
    memoFrame(spark, s"$dir|toks") {
      t(spark, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        // parallelize off the single-file scan…
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        // …and HARD-materialize the token arrays: an exchange alone is
        // not a projection barrier (the optimizer pushes the tokenize
        // past it), and an inlined tokenizer re-runs per element_at
        // inside the shingle lambda — measured 12s vs 1s on sf0.1
        .staged
    }

  /** doc_id → distinct shingles (shared sub-plan of the near-dup ops);
    * the shingle map re-derives per consumer over the memoized token
    * blocks (one codegen'd map — cf. NnDescent.quantizedPlan). */
  private def shingleTable(spark: SparkSession, dir: String): DataFrame =
    tokensFrame(spark, dir)
      .select(col("doc_id"), shingles(col("toks")).as("sh"))

  private val shingleTableSql: String =
    s"""WITH tk AS (SELECT doc_id, text, $tokSql AS toks FROM documents),
       |st AS (SELECT doc_id, $shinglesSql AS sh FROM tk)""".stripMargin

  /** Exact dedup: cluster by content hash, representative = min doc_id.
    * The window over the hash is equivalent to a groupBy(min) + join at
    * scale; with hash-partitioning it is one shuffle either way. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("rep_doc_id", min("doc_id").over(Window.partitionBy("content_hash")))
      .select(col("doc_id"), col("content_hash"), col("rep_doc_id"),
        (col("doc_id") =!= col("rep_doc_id")).as("is_duplicate"))
      .orderBy("doc_id")

  val exactSql: String =
    """SELECT doc_id, md5(text) AS content_hash,
      |       min(doc_id) OVER (PARTITION BY md5(text)) AS rep_doc_id,
      |       doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
      |FROM documents ORDER BY doc_id""".stripMargin

  /** SOFT dedup — reweight instead of drop: each doc's training weight
    * is the inverse of its exact-dup cluster size (integer permille),
    * so an n-copy cluster contributes ONE doc's worth of training mass
    * spread over its copies instead of either n× (no dedup) or a
    * biased survivor (hard dedup). `effective_tokens_milli` is the
    * doc's post-reweight token mass — Σ over the corpus gives the
    * effective training-set size a data card reports.
    *
    * Scale shape: one hash-keyed window (equivalently groupBy+join) —
    * a single shuffle on the content hash; cluster sizes are counts,
    * never materialized memberships, so dup-heavy corpora cost the
    * same shuffle as dup-free ones (contrast the pair-form reports,
    * which are output-bound by construction). */
  def softWeights(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("content_hash"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("content_hash")))
      .select(col("doc_id"), col("cluster_size"),
        expr("1000 DIV cluster_size").as("weight_permille"),
        col("n_tokens"),
        expr("(n_tokens * 1000) DIV cluster_size").as("effective_tokens_milli"))
      .orderBy("doc_id")

  val softWeightsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         count(*) OVER (PARTITION BY md5(text)) AS cluster_size,
       |         CAST(len($tokSql) AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT doc_id, cluster_size,
       |       1000 // cluster_size AS weight_permille,
       |       n_tokens,
       |       (n_tokens * 1000) // cluster_size AS effective_tokens_milli
       |FROM d ORDER BY doc_id""".stripMargin

  /** Soft dedup over NEAR-dup clusters — the form SoftDeDup-style
    * pipelines actually ship: [[softWeights]] reweights only
    * byte-identical copies, while this extends inverse-multiplicity
    * weighting to the LSH-verified near-dup components
    * ([[nearDupClusters]]' bounded min-label propagation over the
    * Jaccard-verified candidate graph). Every member of a near-dup
    * cluster of size s keeps weight ⌊1000/s⌋ — the cluster's total
    * training mass stays ≈ one document, but no variant is dropped,
    * so a downstream sampler still sees the variants' diversity.
    *
    * Scale shape: rides the memoized clusters frame; the only additions
    * are one count window over cluster_rep (a key-partitioned window —
    * never corpus-wide) and the doc-keyed token-count join. */
  def softWeightsNear(spark: SparkSession, dir: String): DataFrame = {
    val clusters = nearDupClusters(spark, dir).select("doc_id", "cluster_rep")
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    clusters.join(docs, "doc_id")
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_rep")))
      .select(col("doc_id"), col("cluster_rep"), col("cluster_size"),
        expr("1000 DIV cluster_size").as("weight_permille"),
        col("n_tokens"),
        expr("(n_tokens * 1000) DIV cluster_size").as("effective_tokens_milli"))
      .orderBy("doc_id")
  }

  def softWeightsNearSql: String = {
    require(nearDupClustersSql.endsWith("ORDER BY doc_id"),
      "nearDupClustersSql no longer ends with its ORDER BY — update softWeightsNearSql's composition")
    val cl = nearDupClustersSql.stripSuffix("ORDER BY doc_id")
    s"""WITH cl AS ($cl),
       |w AS (
       |  SELECT cl.doc_id, cl.cluster_rep,
       |         count(*) OVER (PARTITION BY cl.cluster_rep) AS cluster_size,
       |         CAST(len($tokSql) AS BIGINT) AS n_tokens
       |  FROM cl JOIN documents d ON cl.doc_id = d.doc_id)
       |SELECT doc_id, cluster_rep, cluster_size,
       |       1000 // cluster_size AS weight_permille,
       |       n_tokens,
       |       (n_tokens * 1000) // cluster_size AS effective_tokens_milli
       |FROM w ORDER BY doc_id""".stripMargin
  }

  // Universal-hash family for MinHash: mh_i = (a_i·(H mod p) + b_i) mod p
  // over ONE md5-derived base hash H per shingle — 16× fewer md5s than
  // hashing (i, shingle) pairs, and no explode over i (the 16 minhashes
  // are 16 parallel min-aggregate columns). Constants embedded literally
  // in both engines' plans.
  private val P = 2147483647L // 2^31 - 1
  private def uhA(i: Int): Long = 2L * i + 3L
  private def uhB(i: Int): Long = 104729L * i + 12345L

  /** Per-ROW minhash band buckets from a materialized token-array
    * column — the no-shuffle form of the signature pipeline, built for
    * STREAMING ingest (a streaming plan cannot `.staged`-materialize,
    * and the batch form's per-doc groupBy would be a per-batch shuffle
    * the map-only form doesn't need).
    *
    * Values are identical to [[minhashBands]]: same shingles, same
    * universal-hash family, same band md5s — min over the shingle array
    * equals the grouped min over exploded shingle rows. Expression
    * shape guards (each would silently re-run work under
    * CollapseProject inlining):
    *  - shingles are hashed ONCE via an inner `transform` (hash60 per
    *    shingle, not per (shingle, i) — the "16× fewer md5s" batch
    *    property, kept);
    *  - the k mins accumulate in ONE `aggregate` pass with an array
    *    accumulator (`zip_with` against a constant-folded (aᵢ,bᵢ)
    *    struct array), so the shingle array is referenced exactly once;
    *  - the signature feeds the band folds through a one-element-array
    *    `transform` wrap, so the aggregate is referenced exactly once
    *    (a bare alias would inline—and re-run—it per band). */
  private[graft] def bandStructs(toks: Column, k: Int = 16, bands: Int = 4): Column = {
    val rows = k / bands
    val abArr = array((0 until k).map(i =>
      struct(lit(uhA(i)).as("a"), lit(uhB(i)).as("b"))): _*)
    val hashed = transform(shingles(toks), s => pmod(Portable.hash60(s), lit(P)))
    // P is an exclusive upper bound of every pmod value — a valid +∞ seed
    val sig = aggregate(hashed, array_repeat(lit(P), k),
      (acc, hp) => zip_with(abArr, acc, (ab, cur) =>
        least(cur, pmod(ab.getField("a") * hp + ab.getField("b"), lit(P)))))
    element_at(
      transform(array(sig), sigv =>
        transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.cast("int").as("band"),
            md5(concat_ws(",", (0 until rows).map(r =>
              element_at(sigv, b.cast("int") * rows + r + 1).cast("string")): _*))
              .as("bucket")))),
      1)
  }

  /** Per-doc k-column minhash signatures: one shuffle (the per-doc
    * groupBy of k parallel min-aggregates). Shared by the banding,
    * candidate and estimator paths. */
  private[graft] def minhashSignatures(spark: SparkSession, dir: String, k: Int = 16): DataFrame =
    signaturesOf(shingleTable(spark, dir), k)

  /** Signature pipeline over ANY (doc_id, sh) shingle table — the
    * downstream the word-gram and char-gram arms share. */
  private def signaturesOf(sh: DataFrame, k: Int): DataFrame = {
    val mins = (0 until k).map(i =>
      min(pmod(lit(uhA(i)) * col("hp") + lit(uhB(i)), lit(P))).as(s"mh$i"))
    sh
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), pmod(Portable.hash60(col("shingle")), lit(P)).as("hp"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
  }

  /** Band-fold of a signature frame: 4 bands of k/4 (md5 of the band's
    * minhash run), unpivoted from columns — a pure map stage. */
  private def bandFold(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", (0 until rows).map(r => col(s"mh${b * rows + r}").cast("string")): _*))
          .as("bucket"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** MinHash band buckets: k=16 min-hashes over word-3-gram shingles,
    * folded into 4 bands of 4. */
  def minhashBands(spark: SparkSession, dir: String, k: Int = 16, bands: Int = 4): DataFrame =
    bandFold(minhashSignatures(spark, dir, k), k, bands)
      .orderBy("doc_id", "band")

  def minhashBandsSql(k: Int = 16, bands: Int = 4): String = {
    val rows = k / bands
    val minExprs = (0 until k).map(i =>
      s"min((${uhA(i)} * hp + ${uhB(i)}) % $P) AS mh$i").mkString(",\n|         ")
    val bandSelects = (0 until bands).map { b =>
      val cat = (0 until rows).map(r => s"mh${b * rows + r}::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bucket FROM mh"
    }.mkString("\n|  UNION ALL ")
    s"""$shingleTableSql,
       |sh AS (SELECT doc_id, unnest(st.sh) AS shingle FROM st),
       |hp AS (SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % $P) AS hp FROM sh),
       |mh AS (
       |  SELECT doc_id,
       |         $minExprs
       |  FROM hp GROUP BY doc_id
       |)
       |SELECT * FROM (
       |  $bandSelects
       |) ORDER BY doc_id, band""".stripMargin
  }

  /** LSH candidate pairs: docs sharing any band bucket (a < b), with the
    * count of shared bands. The equi-join on (band, bucket) bounds the
    * comparison set — the 100 TB-safe near-dup path. */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame = {
    // one materialization of the signature pipeline for both join sides
    val b = minhashBands(spark, dir).staged
    val l = b.select(col("doc_id").as("a"), col("band"), col("bucket"))
    val r = b.select(col("doc_id").as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("shared_bands"))
      .orderBy("a", "b")
  }

  val minhashCandidatesSql: String = {
    require(minhashBandsSql().endsWith("ORDER BY doc_id, band"),
      "minhashBandsSql no longer ends with its ORDER BY — update minhashCandidatesSql's composition")
    s"""WITH bands AS (${minhashBandsSql().stripSuffix("ORDER BY doc_id, band")})
       |SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS shared_bands
       |FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
       |WHERE l.doc_id < r.doc_id
       |GROUP BY a, b ORDER BY a, b""".stripMargin
  }

  // ———————————————————————————————————————————————————————————————————
  // CJK-safe shingling: space-free scripts have no word boundaries, so
  // the word-3-gram arm degenerates (one giant "word" → one shingle →
  // everything or nothing collides). The fix every multilingual dedup
  // pipeline ships (e.g. CCNet/RefinedWeb practice): character n-grams
  // over the whitespace-stripped text for those scripts, word n-grams
  // elsewhere, one shared minhash/band/join downstream.
  // ———————————————————————————————————————————————————————————————————

  /** Character n-gram width for the space-free arm — 5 chars carries
    * roughly the same content as a word trigram in CJK text. */
  private val charGramN = 5

  /** Distinct char n-grams of an ALREADY-MATERIALIZED whitespace-
    * stripped string column (same CollapseProject discipline as
    * [[shingles]]: the column must be a concrete attribute or the
    * strip re-runs per element). Short strings yield themselves. */
  private def charShingles(cs: Column): Column =
    array_distinct(
      transform(sequence(lit(1), greatest(lit(1), length(cs) - (charGramN - 1))),
        i => substring(cs, i, lit(charGramN))))

  /** Script-aware shingle table: char n-grams for space-free-script
    * docs (the fixture's `lang` column stands in for script detection —
    * production keys this off a whitespace-ratio or Unicode-block test,
    * the same per-row decision), word 3-grams otherwise. */
  private def cjkShingleTable(spark: SparkSession, dir: String): DataFrame =
    memoFrame(spark, s"$dir|cjk") {
      t(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokens(col("text")).as("toks"),
          regexp_replace(lower(col("text")), "\\s+", "").as("cs"))
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .staged
    }
      .select(col("doc_id"),
        when(col("lang") === "zh", charShingles(col("cs")))
          .otherwise(shingles(col("toks"))).as("sh"))

  private val cjkShingleTableSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id, lang, $tokSql AS toks,
       |         regexp_replace(lower(text), '\\s+', '', 'g') AS cs
       |  FROM documents),
       |st AS (
       |  SELECT doc_id,
       |         CASE WHEN lang = 'zh' THEN
       |           list_distinct(list_transform(
       |             generate_series(1, greatest(1, length(cs) - ${charGramN - 1})),
       |             i -> substr(cs, i, $charGramN)))
       |         ELSE $shinglesSql END AS sh
       |  FROM tk)""".stripMargin

  /** LSH candidate pairs under script-aware shingling — word-gram and
    * char-gram docs flow through the SAME signature/band/join pipeline
    * ([[minhashCandidates]]'s exact shape), so space-free scripts dedup
    * at parity with no second code path downstream of the shingle
    * table. Cross-script pairs are structurally possible but collide
    * only if their shingle STRINGS genuinely overlap. */
  def minhashCandidatesCjk(spark: SparkSession, dir: String): DataFrame = {
    val b = bandFold(signaturesOf(cjkShingleTable(spark, dir), 16), 16, 4).staged
    val l = b.select(col("doc_id").as("a"), col("band"), col("bucket"))
    val r = b.select(col("doc_id").as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("shared_bands"))
      .orderBy("a", "b")
  }

  val minhashCandidatesCjkSql: String = {
    val minExprs = (0 until 16).map(i =>
      s"min((${uhA(i)} * hp + ${uhB(i)}) % $P) AS mh$i").mkString(",\n|         ")
    val bandSelects = (0 until 4).map { b =>
      val cat = (0 until 4).map(r => s"mh${b * 4 + r}::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bucket FROM mh"
    }.mkString("\n|  UNION ALL ")
    s"""$cjkShingleTableSql,
       |sh AS (SELECT doc_id, unnest(st.sh) AS shingle FROM st),
       |hp AS (SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % $P) AS hp FROM sh),
       |mh AS (
       |  SELECT doc_id,
       |         $minExprs
       |  FROM hp GROUP BY doc_id
       |),
       |bands AS (
       |  $bandSelects
       |)
       |SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS shared_bands
       |FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
       |WHERE l.doc_id < r.doc_id
       |GROUP BY a, b ORDER BY a, b""".stripMargin
  }

  /** Script-aware token axis for the ExactSubstr family: single
    * CHARACTERS of the whitespace-stripped lowercased text for
    * space-free-script docs (span positions/widths then measure
    * chars), word tokens elsewhere — the same lang-keyed arm selection
    * as [[cjkShingleTable]]. The `[a-z0-9]+` tokenizer treats
    * ideographs as separators, so under the word arm a genuinely
    * space-free doc tokenizes to the EMPTY array and the span family
    * is silently blind to it; the char axis restores parity with one
    * shared occurrence-count + island-merge pipeline downstream. */
  private def cjkTokensFrame(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokens(col("text")).as("wtoks"),
        regexp_replace(lower(col("text")), "\\s+", "").as("cs"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      // hard projection barrier, cf. tokensFrame (an inlined strip would
      // re-run per extracted char)
      .staged
      .select(col("doc_id"),
        when(col("lang") === "zh",
          transform(sequence(lit(1), greatest(lit(1), length(col("cs")))),
            i => substring(col("cs"), i, lit(1))))
          .otherwise(col("wtoks")).as("toks"))

  /** CJK-safe maximal duplicated-substring spans — the ExactSubstr arm
    * of the script-aware family ([[minhashCandidatesCjk]] is the
    * minhash arm): identical Lee-et-al. seed-and-merge dataflow as
    * [[substringSpans]], but over the script's own token axis, so a
    * shared space-free passage of ≥ k chars reports as one maximal
    * char interval instead of vanishing into an empty word-token
    * array. Positions are 1-based in the script's unit (chars for
    * space-free docs, words otherwise).
    *
    * Cross-axis gram space (same property [[minhashCandidatesCjk]]
    * documents): char-axis and word-axis k-grams share one string
    * space, so a zh doc whose stripped text contains ascii letters
    * (chars 'a','b',… joined by spaces) can collide with an en doc of
    * single-letter words and produce a cross-axis duplicate span. The
    * oracle computes the identical collision, and the reference
    * ExactSubstr (single token space per corpus) would not — a
    * documented deviation, acceptable because real corpora don't carry
    * ≥ k-gram runs of single-letter words, and a per-axis salt would
    * buy the separation at the cost of one more concat per gram. */
  def substringSpansCjk(spark: SparkSession, dir: String, k: Int = spanSeedK): DataFrame =
    substringSpansFrom(cjkTokensFrame(spark, dir), k)
      .orderBy("doc_id", "span_start")

  /** INCREMENTAL dedup candidates — the nightly-ingest shape: only the
    * DELTA batch (docs whose split hash lands in [90,100), standing in
    * for "arrived since the last run") probes the band-bucket index;
    * pairs among the already-indexed base corpus are never recomputed.
    * That asymmetry is the whole point at 100 TB: a full-corpus rerun
    * is quadratic-ish work every night, the incremental probe is
    * |delta| lookups against a persisted index. Emitted pairs are
    * normalized (a < b) so delta↔delta pairs count once. */
  def incrementalCandidates(spark: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(spark, dir).staged
    val deltaSide = bands
      .filter(TextAnalysis.splitHash(col("doc_id")) >= 90)
      .select(col("doc_id").as("d"), col("band"), col("bucket"))
    val indexSide = bands.select(col("doc_id").as("x"), col("band"), col("bucket"))
    deltaSide.join(indexSide, Seq("band", "bucket"))
      .filter(col("d") =!= col("x"))
      .select(least(col("d"), col("x")).as("a"),
        greatest(col("d"), col("x")).as("b"), col("band"))
      .distinct()
      .groupBy("a", "b").agg(count(lit(1)).as("shared_bands"))
      .orderBy("a", "b")
  }

  val incrementalCandidatesSql: String =
    s"""WITH bands AS (${minhashBandsSql().replace("ORDER BY doc_id, band", "")}),
       |delta AS (
       |  SELECT doc_id AS d, band, bucket FROM bands
       |  WHERE ${TextAnalysis.splitHashSql} >= 90
       |),
       |pairs AS (
       |  SELECT DISTINCT least(l.d, r.doc_id) AS a,
       |         greatest(l.d, r.doc_id) AS b, l.band AS band
       |  FROM delta l JOIN bands r
       |    ON l.band = r.band AND l.bucket = r.bucket AND l.d <> r.doc_id
       |)
       |SELECT a, b, count(*) AS shared_bands
       |FROM pairs GROUP BY a, b ORDER BY a, b""".stripMargin

  /** MinHash estimator quality as a first-class query (the sketch twin
    * of `sim_ann_recall`): for every LSH candidate pair, the Jaccard
    * ESTIMATE — the fraction of the k minhashes that agree — next to
    * the exact shingle-set Jaccard. Both are divisions of identical
    * integers, so the doubles agree bit-for-bit cross-engine.
    * Plan: the signature frame is materialized ONCE and feeds the band
    * candidate join and both estimate sides; the exact intersection is
    * an (id, shingle) equi-join RESTRICTED to candidate pairs — never
    * all pairs. At 100 TB every stage is an equi-join or partial+final
    * agg on keys that grow with the data. */
  def minhashEstimates(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val sig = minhashSignatures(spark, dir, k).staged
    val cand = {
      val b = bandFold(sig, k, 4)
      b.select(col("doc_id").as("a"), col("band"), col("bucket"))
        .join(b.select(col("doc_id").as("b"), col("band"), col("bucket")),
          Seq("band", "bucket"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
    }
    val agree = (0 until k)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val sigA = sig.select(col("doc_id").as("a") +:
      (0 until k).map(i => col(s"mh$i").as(s"a_mh$i")): _*)
    val sigB = sig.select(col("doc_id").as("b") +:
      (0 until k).map(i => col(s"mh$i").as(s"b_mh$i")): _*)
    val est = cand.join(sigA, "a").join(sigB, "b")
      .select(col("a"), col("b"), (agree.cast("double") / k).as("est_jaccard"))
    val st = shingleTable(spark, dir).staged
    val sizes = st.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
    val inter = cand
      .join(st.select(col("doc_id").as("a"), explode(col("sh")).as("shingle")), Seq("a"))
      .join(st.select(col("doc_id").as("b"), explode(col("sh")).as("shingle")),
        Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_inter"))
    est.join(inter, Seq("a", "b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("est_jaccard"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double")).as("exact_jaccard"))
      .orderBy("a", "b")
  }

  def minhashEstimatesSql(k: Int = 16): String = {
    val minExprs = (0 until k).map(i =>
      s"min((${uhA(i)} * hp + ${uhB(i)}) % $P) AS mh$i").mkString(",\n|         ")
    val rows = k / 4
    val bandSelects = (0 until 4).map { b =>
      val cat = (0 until rows).map(r => s"mh${b * rows + r}::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bucket FROM mh"
    }.mkString("\n|  UNION ALL ")
    val agreeSql = (0 until k)
      .map(i => s"CASE WHEN x.mh$i = y.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""$shingleTableSql,
       |shx AS (SELECT doc_id, unnest(st.sh) AS shingle FROM st),
       |hpx AS (SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % $P) AS hp FROM shx),
       |mh AS (
       |  SELECT doc_id,
       |         $minExprs
       |  FROM hpx GROUP BY doc_id
       |),
       |bands AS (
       |  $bandSelects
       |),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
       |  WHERE l.doc_id < r.doc_id
       |),
       |est AS (
       |  SELECT c.a, c.b, CAST($agreeSql AS DOUBLE) / $k AS est_jaccard
       |  FROM cand c JOIN mh x ON c.a = x.doc_id JOIN mh y ON c.b = y.doc_id
       |),
       |sizes AS (SELECT doc_id, len(sh)::BIGINT AS n FROM st),
       |inter AS (
       |  SELECT c.a, c.b, count(*) AS n_inter
       |  FROM cand c
       |    JOIN shx sa ON sa.doc_id = c.a
       |    JOIN shx sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
       |  GROUP BY c.a, c.b
       |)
       |SELECT e.a, e.b, e.est_jaccard,
       |       CAST(coalesce(i.n_inter, 0) AS DOUBLE)
       |         / (za.n + zb.n - coalesce(i.n_inter, 0)) AS exact_jaccard
       |FROM est e
       |  LEFT JOIN inter i ON e.a = i.a AND e.b = i.b
       |  JOIN sizes za ON e.a = za.doc_id
       |  JOIN sizes zb ON e.b = zb.doc_id
       |ORDER BY e.a, e.b""".stripMargin
  }

  /** Signature width and pigeonhole-piece geometry. 60 bits is everything
    * Portable.hash60 yields (15 hex chars of md5); 4 pieces of 15 bits
    * give a 2^15-value piece key per position, so candidate-bucket
    * population stays sub-linear in corpus size at 100 TB (the round-5
    * 8-bit pieces had 256 fixed values — quadratic with a small
    * constant). Pigeonhole: Hamming ≤ 3 flips cannot touch all 4 pieces,
    * so every true near-pair shares at least one (position, piece). */
  val simhashBits = 60
  val simhashPieces = 4
  val simhashPieceBits: Int = simhashBits / simhashPieces // 15

  /** SimHash 60-bit signatures: per bit j, the sum of ±1 contributions of
    * each distinct token's hash bit; signature bit j set iff the sum is
    * positive. The 60 bit-sums are 60 parallel aggregate columns over
    * ONE exploded token row per (doc, token) — not a (doc × token × bit)
    * explosion, which is 60× the shuffle for the same answer. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val sums = (0 until simhashBits).map(j =>
      sum(when(expr(s"shiftright(th, $j) % 2 = 1"), 1L).otherwise(-1L)).as(s"s$j"))
    val sig = (0 until simhashBits).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    t(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
      .withColumn("th", Portable.hash60(col("tok")))
      .groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
      .orderBy("doc_id")
  }

  val simhashSql: String = {
    val sums = (0 until simhashBits).map(j =>
      s"sum(CASE WHEN (th >> $j) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n|         ")
    val sig = (0 until simhashBits).map(j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM tk),
       |th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS th FROM tok),
       |bits AS (
       |  SELECT doc_id,
       |         $sums
       |  FROM th GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($sig AS BIGINT) AS simhash
       |FROM bits ORDER BY doc_id""".stripMargin
  }

  /** SimHash near-dup pairs within Hamming ≤ 3, found by equi-joining on
    * the 4 15-bit signature pieces (pigeonhole-complete for ≤ 3 flips),
    * then verifying with bit_count — no cross join anywhere. The
    * (position, piece) key has 4 × 32,768 values, so bucket sizes stay
    * bounded as the corpus grows. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhash(spark, dir)
    val pieces = sig.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(simhashPieces - 1))).as("p"))
      .withColumn("piece",
        expr(s"shiftright(simhash, p * $simhashPieceBits) % ${1 << simhashPieceBits}"))
      .staged // read twice (both join sides)
    val l = pieces.select(col("doc_id").as("a"), col("simhash").as("sig_a"),
      col("p"), col("piece"))
    val r = pieces.select(col("doc_id").as("b"), col("simhash").as("sig_b"),
      col("p"), col("piece"))
    l.join(r, Seq("p", "piece"))
      .filter(col("a") < col("b"))
      // hamming filter BEFORE the pair-dedup: bit_count is a cheap scalar,
      // and it shrinks the distinct's shuffle to the near-pairs only
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 3)
      .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
      .distinct()
      .orderBy("a", "b")
  }

  val simhashPairsSql: String =
    s"""WITH sig AS (${simhashSql.replace("ORDER BY doc_id", "")}),
       |pieces AS (
       |  SELECT doc_id, simhash, ps.p AS p,
       |         (simhash >> (ps.p * $simhashPieceBits)) % ${1 << simhashPieceBits} AS piece
       |  FROM sig, (SELECT unnest(generate_series(0, ${simhashPieces - 1})) AS p) ps
       |),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       |         l.simhash AS sig_a, r.simhash AS sig_b
       |  FROM pieces l JOIN pieces r ON l.p = r.p AND l.piece = r.piece
       |  WHERE l.doc_id < r.doc_id
       |)
       |SELECT a, b, bit_count(xor(sig_a, sig_b))::INT AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |ORDER BY a, b""".stripMargin

  /** INCREMENTAL SimHash near-dup — the nightly-ingest twin of
    * [[incrementalCandidates]]: only the DELTA batch (split hash in
    * [90,100), standing in for "arrived since the last run") probes the
    * (position, piece) index of the full corpus; base×base pairs are
    * never recomputed. The probe is |delta| equi-join lookups against a
    * persisted piece index — the shape that makes nightly near-dup
    * affordable at 100 TB. Pairs are normalized (a < b) so delta↔delta
    * pairs count once; hamming verification is identical to
    * [[simhashPairs]]. */
  def simhashIncremental(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhash(spark, dir)
    val pieces = sig.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(simhashPieces - 1))).as("p"))
      .withColumn("piece",
        expr(s"shiftright(simhash, p * $simhashPieceBits) % ${1 << simhashPieceBits}"))
      .staged // read twice (delta slice + index side)
    val delta = pieces
      .filter(TextAnalysis.splitHash(col("doc_id")) >= 90)
      .select(col("doc_id").as("d"), col("simhash").as("sig_d"),
        col("p"), col("piece"))
    val index = pieces.select(col("doc_id").as("x"), col("simhash").as("sig_x"),
      col("p"), col("piece"))
    delta.join(index, Seq("p", "piece"))
      .filter(col("d") =!= col("x"))
      .withColumn("hamming", bit_count(col("sig_d").bitwiseXOR(col("sig_x"))))
      .filter(col("hamming") <= 3)
      .select(least(col("d"), col("x")).as("a"),
        greatest(col("d"), col("x")).as("b"),
        col("hamming").cast("int").as("hamming"))
      .distinct()
      .orderBy("a", "b")
  }

  val simhashIncrementalSql: String =
    s"""WITH sig AS (${simhashSql.replace("ORDER BY doc_id", "")}),
       |pieces AS (
       |  SELECT doc_id, simhash, ps.p AS p,
       |         (simhash >> (ps.p * $simhashPieceBits)) % ${1 << simhashPieceBits} AS piece
       |  FROM sig, (SELECT unnest(generate_series(0, ${simhashPieces - 1})) AS p) ps
       |),
       |delta AS (
       |  SELECT doc_id AS d, simhash AS sig_d, p, piece FROM pieces
       |  WHERE ${TextAnalysis.splitHashSql} >= 90
       |),
       |cand AS (
       |  SELECT DISTINCT least(l.d, r.doc_id) AS a, greatest(l.d, r.doc_id) AS b,
       |         CASE WHEN l.d < r.doc_id THEN l.sig_d ELSE r.simhash END AS sig_a,
       |         CASE WHEN l.d < r.doc_id THEN r.simhash ELSE l.sig_d END AS sig_b
       |  FROM delta l JOIN pieces r ON l.p = r.p AND l.piece = r.piece
       |  WHERE l.d <> r.doc_id
       |)
       |SELECT a, b, bit_count(xor(sig_a, sig_b))::INT AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |ORDER BY a, b""".stripMargin

  /** n-gram Jaccard near-dup pairs via inverted-index join: each shared
    * distinct shingle contributes one joined row, so count(*) per pair IS
    * |A∩B|; |A∪B| from per-doc sizes. Exact integer ratio → double. */
  /** Document-frequency cap: shingles appearing in more than this many
    * documents are dropped from the similarity index (standard
    * stop-shingle removal). Caps the inverted-index join fanout — a
    * shingle shared by f docs generates O(f²) pair rows, so without the
    * cap one ubiquitous shingle dominates the whole job at scale. The
    * doc's effective shingle set (and |A|,|B|) is the rare set,
    * consistently on both engines. */
  val maxShingleDf = 20

  /** jaccardPairs is MEMOIZED per (session, dir, threshold): both the
    * pairs query and the edit-distance verify stage consume the same
    * candidate set in one harness session, and re-deriving the
    * tokenize→shingle→inverted-index pipeline is the dominant cost.
    * Same pattern as the aria drain / k-means training memos; Bench
    * evicts between passes so each pass re-pays the pipeline. */
  private val pairsCache =
    new java.util.HashMap[SparkSession, Map[(String, Double), DataFrame]]

  /** The df-capped rare-shingle inverted index, memoized per
    * (session, dir): shared by [[jaccardPairs]] and
    * [[containmentPairs]], which differ only in how they score the
    * joined index against itself. */
  private val rareCache =
    new java.util.HashMap[SparkSession, Map[String, DataFrame]]

  private[graft] def evictPairs(spark: SparkSession): Unit =
    pairsCache.synchronized {
      pairsCache.remove(spark); rareCache.remove(spark)
      frameCache.synchronized { frameCache.remove(spark) }
      ()
    }

  private def rareIndex(spark: SparkSession, dir: String): DataFrame =
    pairsCache.synchronized {
      rareCache.keySet.removeIf(s => s.sparkContext.isStopped)
      val perSession = rareCache.getOrDefault(spark, Map.empty)
      perSession.get(dir) match {
        case Some(df) => df
        case None =>
          val st = shingleTable(spark, dir)
          // materialize the exploded index once (lazy checkpoint): it is
          // read for df counts and both join sides, and re-deriving the
          // tokenize→shingle pipeline each time dominates otherwise
          val inv = st.select(col("doc_id"), explode(col("sh")).as("shingle"))
            .staged
          val rare = inv.join(
            inv.groupBy("shingle").agg(count(lit(1)).as("df"))
              .filter(col("df") <= maxShingleDf).select("shingle"),
            Seq("shingle"))
            .staged
          rareCache.put(spark, perSession + (dir -> rare))
          rare
      }
    }

  def jaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.2): DataFrame =
    pairsCache.synchronized {
      pairsCache.keySet.removeIf(s => s.sparkContext.isStopped)
      val perSession = pairsCache.getOrDefault(spark, Map.empty)
      perSession.get((dir, threshold)) match {
        case Some(df) => df
        case None =>
          val df = jaccardPairsUncached(spark, dir, threshold).staged
          pairsCache.put(spark, perSession + ((dir, threshold) -> df))
          df
      }
    }

  private def jaccardPairsUncached(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    val rare = rareIndex(spark, dir)
    val sizes = rare.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = rare.select(col("doc_id").as("a"), col("shingle"))
      .join(rare.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("jaccard"))
      .orderBy("a", "b")
  }

  def jaccardPairsSql(threshold: Double = 0.2): String =
    jaccardPairsSqlBody(threshold) + "\nORDER BY a, b"

  /** The pair query WITHOUT its trailing ORDER BY — for composition
    * inside CTEs ([[thresholdCurveSql]]), where post-hoc string surgery
    * on the ordered form would be a silent no-op after any reformat. */
  private def jaccardPairsSqlBody(threshold: Double): String =
    s"""$shingleTableSql,
       |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM st),
       |rare AS (
       |  SELECT inv.doc_id, inv.shingle FROM inv
       |  JOIN (SELECT shingle, count(*) AS df FROM inv GROUP BY shingle) d
       |    ON inv.shingle = d.shingle
       |  WHERE d.df <= $maxShingleDf
       |),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
       |pairs AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
       |  FROM rare l JOIN rare r ON l.shingle = r.shingle
       |  WHERE l.doc_id < r.doc_id GROUP BY a, b
       |)
       |SELECT a, b, inter,
       |       CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
       |FROM pairs JOIN sizes sa ON pairs.a = sa.doc_id
       |           JOIN sizes sb ON pairs.b = sb.doc_id
       |WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= $threshold""".stripMargin

  /** Directed n-gram CONTAINMENT pairs: containment(src→dst) =
    * |sh(src) ∩ sh(dst)| / |sh(src)| over the df-capped rare-shingle
    * sets. Asymmetric by design — a short document quoted or embedded
    * inside a long one scores ~1 in the src→dst direction while its
    * Jaccard (and the reverse direction) stays low, so this catches the
    * subsumption/quotation duplicates [[jaccardPairs]]' symmetric ratio
    * misses (Broder 1997's containment variant). Shares the memoized
    * inverted index with the Jaccard family: same single equi-join on
    * the shingle key, same df-cap bounding the fanout at 100 TB; only
    * the scoring differs, and the `src <> dst` join emits both
    * directions of each candidate pair. */
  def containmentPairs(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val rare = rareIndex(spark, dir)
    val sizes = rare.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // intersection counts are symmetric: join+count once on a < b (half
    // the join output and shuffle of the naive src <> dst form), then
    // mirror each undirected pair into its two directed rows
    val und = rare.select(col("doc_id").as("a"), col("shingle"))
      .join(rare.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    val dir2 = und.select(col("a").as("src"), col("b").as("dst"), col("inter"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst"), col("inter")))
    dir2
      .join(sizes.select(col("doc_id").as("src"), col("n_sh").as("n_src")), Seq("src"))
      .withColumn("containment", col("inter").cast("double") / col("n_src"))
      .filter(col("containment") >= tau)
      .select(col("src"), col("dst"), col("inter"), col("n_src"), col("containment"))
      .orderBy("src", "dst")
  }

  def containmentPairsSql(tau: Double = 0.5): String =
    s"""$shingleTableSql,
       |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM st),
       |rare AS (
       |  SELECT inv.doc_id, inv.shingle FROM inv
       |  JOIN (SELECT shingle, count(*) AS df FROM inv GROUP BY shingle) d
       |    ON inv.shingle = d.shingle
       |  WHERE d.df <= $maxShingleDf
       |),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
       |und AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
       |  FROM rare l JOIN rare r ON l.shingle = r.shingle
       |  WHERE l.doc_id < r.doc_id GROUP BY a, b
       |),
       |pairs AS (
       |  SELECT a AS src, b AS dst, inter FROM und
       |  UNION ALL
       |  SELECT b AS src, a AS dst, inter FROM und
       |)
       |SELECT src, dst, inter, sa.n_sh AS n_src,
       |       CAST(inter AS DOUBLE) / sa.n_sh AS containment
       |FROM pairs JOIN sizes sa ON pairs.src = sa.doc_id
       |WHERE CAST(inter AS DOUBLE) / sa.n_sh >= $tau
       |ORDER BY src, dst""".stripMargin

  /** Edit-distance verification of near-dup candidates — the last stage
    * of a production dedup funnel: cheap sketch candidates (here the
    * jaccard inverted-index pairs) get an EXACT character-level check
    * before a doc is dropped. Levenshtein is O(L²) per pair, so it runs
    * on a fixed PREFIX (both engines' substr/levenshtein are
    * code-point-based → identical integers); the candidate set is already
    * df-capped, so the quadratic cost is per-candidate-bounded, never
    * corpus-shaped. edit_sim = 1 − dist/max(|pa|,|pb|) (exact-identical
    * doubles: small-integer ratio). */
  val editPrefix = 120

  def editVerify(spark: SparkSession, dir: String, threshold: Double = 0.2): DataFrame = {
    val pre = t(spark, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, editPrefix).as("pre"))
    jaccardPairs(spark, dir, threshold)
      .join(pre.select(col("doc_id").as("a"), col("pre").as("pa")), Seq("a"))
      .join(pre.select(col("doc_id").as("b"), col("pre").as("pb")), Seq("b"))
      .withColumn("edit_dist", levenshtein(col("pa"), col("pb")).cast("long"))
      .withColumn("edit_sim",
        lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(col("pa")), length(col("pb"))).cast("double"))
      .select(col("a"), col("b"), col("jaccard"), col("edit_dist"), col("edit_sim"))
      .orderBy("a", "b")
  }

  def editVerifySql(threshold: Double = 0.2): String = {
    val pairs = jaccardPairsSqlBody(threshold)
    s"""WITH cand AS ($pairs),
       |pre AS (SELECT doc_id, substr(text, 1, $editPrefix) AS pre FROM documents)
       |SELECT c.a, c.b, c.jaccard,
       |       CAST(levenshtein(la.pre, lb.pre) AS BIGINT) AS edit_dist,
       |       1.0 - CAST(levenshtein(la.pre, lb.pre) AS DOUBLE)
       |             / greatest(length(la.pre), length(lb.pre)) AS edit_sim
       |FROM cand c JOIN pre la ON c.a = la.doc_id
       |            JOIN pre lb ON c.b = lb.doc_id
       |ORDER BY a, b""".stripMargin
  }

  /** Threshold grid for [[thresholdCurve]], Jaccard in permille. */
  private val curveTaus = Seq(200L, 300L, 400L, 500L, 600L, 700L, 800L, 900L)

  /** Dedup threshold-tuning curve — the report a pipeline runs BEFORE
    * fixing its near-dup similarity cutoff (the dedup-side sibling of
    * `pipeline_quality_sweep`): for each candidate Jaccard threshold τ,
    * how many verified pairs survive and how many distinct documents
    * participate in at least one such pair (the upper bound on docs a
    * dedup pass at τ would touch). Thresholds compare the SAME doubles
    * both engines already agree on for `dedup_jaccard_pairs`, against
    * `τ/1000` computed identically, so the filter is exact.
    *
    * Scale shape: rides the memoized verified-pairs frame (bucketed
    * candidate generation — never all-pairs); the ×|grid| explode is
    * map-side over the candidate-bounded pair set and collapses to
    * ≤|grid| cells (pairs) plus a (τ, doc) distinct agg bounded by
    * grid × participating docs. */
  def thresholdCurve(spark: SparkSession, dir: String): DataFrame = {
    val p = jaccardPairs(spark, dir)
      .select(col("a"), col("b"), col("jaccard"),
        explode(array(curveTaus.map(lit(_)): _*)).as("tau_permille"))
      .filter(col("jaccard") >= col("tau_permille").cast("double") / lit(1000.0d))
      .staged // consumers: the pair count and the distinct-doc count
    val nPairs = p.groupBy("tau_permille").agg(count(lit(1)).as("n_pairs"))
    val nDocs = p
      .select(col("tau_permille"), explode(array(col("a"), col("b"))).as("d"))
      .groupBy("tau_permille").agg(countDistinct("d").as("n_dup_docs"))
    nPairs.join(nDocs, Seq("tau_permille")).orderBy("tau_permille")
  }

  def thresholdCurveSql: String = {
    val pairs = jaccardPairsSqlBody(0.2)
    val grid = curveTaus.mkString("[", ", ", "]")
    s"""WITH cand AS ($pairs),
       |grid AS (SELECT CAST(unnest($grid) AS BIGINT) AS tau_permille),
       |kept AS (
       |  SELECT g.tau_permille, c.a, c.b
       |  FROM cand c JOIN grid g
       |    ON c.jaccard >= CAST(g.tau_permille AS DOUBLE) / 1000.0
       |),
       |np AS (SELECT tau_permille, count(*) AS n_pairs FROM kept GROUP BY 1),
       |nd AS (
       |  SELECT tau_permille, count(DISTINCT d) AS n_dup_docs FROM (
       |    SELECT tau_permille, a AS d FROM kept
       |    UNION ALL SELECT tau_permille, b FROM kept)
       |  GROUP BY 1)
       |SELECT tau_permille, n_pairs, n_dup_docs
       |FROM np JOIN nd USING (tau_permille)
       |ORDER BY tau_permille""".stripMargin
  }

  /** Near-dup clustering: ROUNDS iterations of min-label propagation
    * over the (symmetric) LSH candidate graph — turns candidate pairs
    * into dedup groups with a canonical representative (min doc_id).
    * Bounded-iteration propagation (not run-to-convergence) keeps the
    * operator a pure deterministic dataflow with an exact SQL oracle;
    * ROUNDS=5 covers graph diameter 5, far beyond near-dup cluster
    * diameters in practice. Each round is one join + grouped min —
    * the standard scalable connected-components kernel (cf. GraphX
    * label propagation). */
  val clusterRounds = 5

  def nearDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashCandidates(spark, dir).select("a", "b")
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
      .staged
    var labels = t(spark, dir, "documents")
      .select(col("doc_id"), col("doc_id").as("label"))
    var converged = false
    for (_ <- 1 to clusterRounds if !converged) {
      val step = labels.as("l")
        .join(edges.as("e"), col("l.doc_id") === col("e.src"), "left")
        .join(labels.select(col("doc_id").as("nd"), col("label").as("nl")).as("n"),
          col("e.dst") === col("n.nd"), "left")
        .groupBy(col("l.doc_id").as("doc_id"), col("l.label").as("old_label"))
        .agg(min("n.nl").as("min_neighbor"))
        .select(col("doc_id"), col("old_label"),
          least(col("old_label"), coalesce(col("min_neighbor"), col("old_label")))
            .as("label"))
        .staged
      // fixpoint early-exit: a round that lowers no label ends the
      // propagation (remaining rounds would be identity — the bounded
      // ROUNDS contract and the fixed-round oracle are unchanged).
      // One full-scan aggregate per round: the same action that answers
      // convergence also materializes the lazy checkpoint, instead of a
      // short-circuiting probe followed by a second materializing pass.
      converged = step
        .agg(max(when(col("label") < col("old_label"), 1).otherwise(0)).as("lowered"))
        .first().getInt(0) == 0
      labels = step.select("doc_id", "label")
    }
    labels.select(col("doc_id"), col("label").as("cluster_rep"),
        (col("label") =!= col("doc_id")).as("is_duplicate"))
      .orderBy("doc_id")
  }

  val nearDupClustersSql: String = {
    require(minhashCandidatesSql.endsWith("ORDER BY a, b"),
      "minhashCandidatesSql no longer ends with its ORDER BY — update nearDupClustersSql's composition")
    val base = minhashCandidatesSql.stripSuffix("ORDER BY a, b")
    val rounds = (1 to clusterRounds).map { i =>
      s"""l$i AS (
         |  SELECT l.doc_id,
         |         least(l.label, coalesce(min(n.label), l.label)) AS label
         |  FROM l${i - 1} l
         |  LEFT JOIN edges e ON e.src = l.doc_id
         |  LEFT JOIN l${i - 1} n ON n.doc_id = e.dst
         |  GROUP BY l.doc_id, l.label
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH cand AS ($base),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM cand
       |  UNION ALL SELECT b, a FROM cand
       |),
       |l0 AS (SELECT doc_id, doc_id AS label FROM documents),
       |$rounds
       |SELECT doc_id, label AS cluster_rep, label <> doc_id AS is_duplicate
       |FROM l$clusterRounds ORDER BY doc_id""".stripMargin
  }

  /** Cross-document repeated-span detection (the exact-substring-dedup
    * signal of Lee et al.'s "Deduplicating Training Data Makes Language
    * Models Better"): word 8-gram spans occurring in ≥2 distinct
    * documents. Inverted-index shape — explode distinct spans per doc,
    * ONE shuffle on the span (at 100 TB the span would be hashed first;
    * the raw string is kept here for oracle readability — the dataflow
    * is identical). */
  def repeatedSpans(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      // hard projection barrier — see shingleTable (inlined tokenizer
      // would re-run per slice() call inside the lambda)
      .staged
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(1), size(col("toks")) - (k - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(k)))))).as("span"))
      .groupBy("span")
      // spans are per-doc distinct → plain count = distinct-doc count
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), col("span"))

  def repeatedSpansSql(k: Int = 8): String =
    s"""WITH tk AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_transform(generate_series(1, len(toks) - ${k - 1}),
       |           i -> array_to_string(toks[i:i+${k - 1}], ' ')))) AS span
       |  FROM tk WHERE len(toks) >= $k
       |)
       |SELECT span, count(*)::BIGINT AS n_docs, min(doc_id) AS first_doc
       |FROM grams GROUP BY span HAVING count(*) >= 2
       |ORDER BY n_docs DESC, span""".stripMargin

  /** Seed k-gram width for the MAXIMAL-span family below. */
  private[graft] val spanSeedK = 8

  /** MAXIMAL duplicated-substring spans (the ExactSubstr half of Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"): per document, the maximal token intervals covered by
    * duplicated substrings of length ≥ k — a 200-token passage shared
    * between two documents reports as ONE ~200-token span, not 193
    * overlapping k-grams ([[repeatedSpans]]' fixed-gram under-merge).
    *
    * Suffix-array-free formulation that survives 100 TB: (1) every
    * k-gram OCCURRENCE (doc, position) — positions kept, duplicates
    * within a doc kept: a substring repeated twice in ONE doc is
    * duplicated corpus-wide by Lee et al.'s definition; (2) a gram is
    * duplicated iff its global occurrence count ≥ 2 — a partial-agg
    * count keyed on the gram, never a pair join, so there is NO
    * candidate-pair explosion anywhere in this operator and no df cap
    * is needed (a million-fold boilerplate gram costs one count cell
    * and linear join-back fanout); (3) seed extension: consecutive
    * covered start positions merge left/right into maximal intervals —
    * a per-doc gaps-and-islands window (all seed intervals have width
    * k and arrive sorted, so a new island begins exactly when
    * pos − lag(pos) ≥ k). The result is the union of duplicated-k-gram
    * intervals: every maximal duplicated substring of length L ≥ k
    * contributes its L−k+1 consecutive seeds and collapses to one
    * interval; overlapping matches AGAINST DIFFERENT sources merge into
    * one mask interval — the span-granularity over-approximation the
    * paper's span-removal step works on.
    *
    * Shuffles: one on the gram (count + join-back reuse the exchange),
    * one on doc_id for the window — both linear. The raw gram string is
    * the key for oracle readability; at 100 TB it would be hashed first
    * (same dataflow), cf. [[repeatedSpans]]. */
  def substringSpans(spark: SparkSession, dir: String, k: Int = spanSeedK): DataFrame =
    substringSpansFrom(tokensFrame(spark, dir), k)
      .orderBy("doc_id", "span_start")

  // (tokensFrame — the shared memoized token corpus — is defined beside
  // shingleTable at the top of the file)

  /** (doc_id, pos, gram) k-gram occurrence rows of a (doc_id, toks)
    * frame — positions kept, within-doc repeats kept. */
  private def gramOccurrences(toks: DataFrame, k: Int): DataFrame =
    toks
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - (k - 1)),
        i => struct(i.cast("long").as("pos"),
          concat_ws(" ", slice(col("toks"), i, lit(k))).as("gram")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))

  /** Merge covered k-gram START positions (doc_id, pos) into maximal
    * token intervals: all seed intervals have width k and arrive
    * sorted, so a new island begins exactly when pos − lag(pos) ≥ k —
    * one doc-keyed window. Shared by the duplicated-substring and
    * contamination-mask families. */
  private[graft] def maximalSpans(covered: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    covered
      .withColumn("ni",
        when(coalesce(col("pos") - lag("pos", 1).over(byDoc), lit(k.toLong)) >= k, 1L)
          .otherwise(0L))
      .withColumn("island",
        sum("ni").over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(k.toLong) - min("pos")).as("span_tokens"))
      .select(col("doc_id"), col("span_start"), col("span_tokens"))
  }

  /** Core on a (doc_id, toks) frame: (doc_id, span_start, span_tokens),
    * 1-based token positions, unordered (callers sort). */
  private[graft] def substringSpansFrom(toks: DataFrame, k: Int): DataFrame = {
    val grams = gramOccurrences(toks, k)
      .staged // two consumers: the occurrence count and the join-back
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select("gram")
    val covered = grams.join(dup, Seq("gram")).select("doc_id", "pos")
    maximalSpans(covered, k)
  }

  /** The word-token tk CTE shared by the span family's oracles. */
  private val wordTkCte: String =
    s"tk AS (SELECT doc_id, $tokSql AS toks FROM documents)"

  /** Script-aware tk CTE mirroring [[cjkTokensFrame]]: char tokens of
    * the whitespace-stripped lowercased text for lang='zh', word tokens
    * otherwise. */
  private val cjkTkCte: String =
    s"""tk0 AS (
       |  SELECT doc_id, lang, $tokSql AS wtoks,
       |         regexp_replace(lower(text), '\\s+', '', 'g') AS cs
       |  FROM documents),
       |tk AS (
       |  SELECT doc_id,
       |         CASE WHEN lang = 'zh' THEN
       |           list_transform(generate_series(1, greatest(1, length(cs))),
       |             i -> substr(cs, i, 1))
       |         ELSE wtoks END AS toks
       |  FROM tk0)""".stripMargin

  private def substringSpanCtes(k: Int, tkCte: String = wordTkCte): String =
    s"""$tkCte,
       |g AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
       |         array_to_string(toks[u.i:u.i+${k - 1}], ' ') AS gram
       |  FROM tk, unnest(generate_series(1, len(toks) - ${k - 1})) AS u(i)
       |  WHERE len(toks) >= $k
       |),
       |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
       |cov AS (SELECT g.doc_id, g.pos FROM g JOIN dup ON g.gram = dup.gram),
       |isl AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN coalesce(pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), $k) >= $k
       |              THEN 1 ELSE 0 END AS ni
       |  FROM cov),
       |isl2 AS (
       |  SELECT doc_id, pos,
       |         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM isl),
       |spans AS (
       |  SELECT doc_id, min(pos) AS span_start,
       |         max(pos) + $k - min(pos) AS span_tokens
       |  FROM isl2 GROUP BY doc_id, island)""".stripMargin

  def substringSpansSql(k: Int = spanSeedK): String =
    s"""WITH ${substringSpanCtes(k)}
       |SELECT doc_id, span_start, CAST(span_tokens AS BIGINT) AS span_tokens
       |FROM spans ORDER BY doc_id, span_start""".stripMargin

  def substringSpansCjkSql(k: Int = spanSeedK): String =
    s"""WITH ${substringSpanCtes(k, cjkTkCte)}
       |SELECT doc_id, span_start, CAST(span_tokens AS BIGINT) AS span_tokens
       |FROM spans ORDER BY doc_id, span_start""".stripMargin

  /** Per-document duplicated-token share at SPAN granularity — the
    * per-doc report the span-removal / doc-dropping policy reads:
    * (doc_id, n_tokens, n_spans, dup_tokens, dup_permille), every doc
    * present (zero rows for clean docs). dup_permille is integer
    * (1000·dup DIV total) so both engines agree exactly. Composes
    * [[substringSpansFrom]] with one doc-keyed agg + a doc-keyed left
    * join against token counts — both linear, keyed on doc_id. */
  def substringShare(spark: SparkSession, dir: String, k: Int = spanSeedK): DataFrame =
    substringShareFrom(tokensFrame(spark, dir), k)

  private[graft] def substringShareFrom(toks: DataFrame, k: Int): DataFrame = {
    val perDoc = substringSpansFrom(toks, k)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("span_tokens").as("dup_tokens"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") > 0,
          expr("1000L * coalesce(dup_tokens, 0L) DIV n_tokens"))
          .otherwise(0L).as("dup_permille"))
      .orderBy("doc_id")
  }

  /** Lee et al.'s removal POLICY threshold: only duplicated spans of
    * ≥ 50 tokens are cut (short boilerplate matches are left alone —
    * the paper's ExactSubstr setting). */
  private[graft] val removalMinSpan = 50

  /** Span-removal accounting under the ≥[[removalMinSpan]]-token
    * policy: per document (n_tokens, removed_tokens, kept_tokens) plus
    * a corpus-total ROLLUP row (doc_id = −1) — the before/after budget
    * a substring-dedup run reports. Spans are disjoint maximal
    * intervals, so removed ≤ total by construction. Same two linear
    * shuffles as the span kernel plus one doc-keyed agg. */
  def substringRemoval(spark: SparkSession, dir: String, k: Int = spanSeedK,
                       minSpan: Int = removalMinSpan): DataFrame =
    substringRemovalFrom(tokensFrame(spark, dir), k, minSpan)

  private[graft] def substringRemovalFrom(toks: DataFrame, k: Int,
                                          minSpan: Int): DataFrame = {
    val removed = substringSpansFrom(toks, k)
      .filter(col("span_tokens") >= minSpan)
      .groupBy("doc_id").agg(sum("span_tokens").as("removed"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("nt"))
      .join(removed, Seq("doc_id"), "left")
      .rollup(col("doc_id")) // Column form — see Bpe.bpeEncodeFrom
      .agg(sum("nt").as("n_tokens"),
        sum(coalesce(col("removed"), lit(0L))).as("removed_tokens"))
      .select(coalesce(col("doc_id"), lit(-1L)).as("doc_id"),
        col("n_tokens"), col("removed_tokens"),
        (col("n_tokens") - col("removed_tokens")).as("kept_tokens"))
      .orderBy("doc_id")
  }

  def substringRemovalSql(k: Int = spanSeedK, minSpan: Int = removalMinSpan): String =
    s"""WITH ${substringSpanCtes(k)},
       |rem AS (
       |  SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS removed
       |  FROM spans WHERE span_tokens >= $minSpan GROUP BY doc_id),
       |pd AS (
       |  SELECT tk.doc_id, CAST(len(tk.toks) AS BIGINT) AS nt,
       |         coalesce(rem.removed, 0) AS removed
       |  FROM tk LEFT JOIN rem ON tk.doc_id = rem.doc_id)
       |SELECT coalesce(doc_id, -1) AS doc_id,
       |       CAST(sum(nt) AS BIGINT) AS n_tokens,
       |       CAST(sum(removed) AS BIGINT) AS removed_tokens,
       |       CAST(sum(nt) - sum(removed) AS BIGINT) AS kept_tokens
       |FROM pd GROUP BY ROLLUP(doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Span-level eval-set contamination MASK on the train side — the
    * decontamination step itself, not the audit: for every TRAIN-split
    * document, the maximal token intervals covered by k-grams that
    * also appear anywhere in the TEST split (the benchmark set), with
    * per-doc contaminated-token share — exactly what gets cut before
    * training so eval answers don't leak in (GPT-3 appendix C /
    * Lee et al. §6 procedure; the existing `dedup_decontaminate` is
    * the per-TEST-doc gram-count audit, the opposite direction).
    *
    * Scale: masking needs only MEMBERSHIP, so the train occurrences
    * LEFT-SEMI join the distinct eval gram set — no row multiplication
    * exists anywhere, so unlike the audit query no df cap is needed: a
    * boilerplate gram shared by every doc costs one probe per
    * occurrence, not f_test·f_train rows. The eval gram set is
    * benchmark-sized (broadcastable at real scale). Then the shared
    * island window merges covered starts into maximal spans. */
  def contaminationMask(spark: SparkSession, dir: String, k: Int = spanSeedK): DataFrame = {
    val toks = tokensFrame(spark, dir)
    val h = TextAnalysis.splitHash(col("doc_id"))
    contaminationMaskFrom(toks.filter(h < 80), toks.filter(h >= 90), k)
  }

  private[graft] def contaminationMaskFrom(trainToks: DataFrame,
                                           evalToks: DataFrame, k: Int): DataFrame = {
    val evalGrams = gramOccurrences(evalToks, k).select("gram").distinct()
    val covered = gramOccurrences(trainToks, k)
      .join(evalGrams, Seq("gram"), "leftsemi")
      .select("doc_id", "pos")
    val perDoc = maximalSpans(covered, k)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("span_tokens").as("contaminated_tokens"))
    trainToks.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("contaminated_tokens"), lit(0L)).as("contaminated_tokens"),
        when(col("n_tokens") > 0,
          expr("1000L * coalesce(contaminated_tokens, 0L) DIV n_tokens"))
          .otherwise(0L).as("contaminated_permille"))
      .orderBy("doc_id")
  }

  def contaminationMaskSql(k: Int = spanSeedK): String = {
    val h = TextAnalysis.splitHashSql
    s"""WITH tk AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |tr AS (SELECT doc_id, toks FROM tk WHERE $h < 80),
       |g AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
       |         array_to_string(toks[u.i:u.i+${k - 1}], ' ') AS gram
       |  FROM tr, unnest(generate_series(1, len(toks) - ${k - 1})) AS u(i)
       |  WHERE len(toks) >= $k
       |),
       |ev AS (
       |  SELECT DISTINCT array_to_string(toks[u.i:u.i+${k - 1}], ' ') AS gram
       |  FROM tk, unnest(generate_series(1, len(toks) - ${k - 1})) AS u(i)
       |  WHERE $h >= 90 AND len(toks) >= $k
       |),
       |cov AS (SELECT g.doc_id, g.pos FROM g JOIN ev ON g.gram = ev.gram),
       |isl AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN coalesce(pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), $k) >= $k
       |              THEN 1 ELSE 0 END AS ni
       |  FROM cov),
       |isl2 AS (
       |  SELECT doc_id, pos,
       |         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM isl),
       |spans AS (
       |  SELECT doc_id, min(pos) AS span_start,
       |         max(pos) + $k - min(pos) AS span_tokens
       |  FROM isl2 GROUP BY doc_id, island),
       |per_doc AS (
       |  SELECT doc_id, count(*) AS n_spans,
       |         CAST(sum(span_tokens) AS BIGINT) AS contaminated_tokens
       |  FROM spans GROUP BY doc_id)
       |SELECT tr.doc_id, CAST(len(tr.toks) AS BIGINT) AS n_tokens,
       |       coalesce(p.n_spans, 0) AS n_spans,
       |       coalesce(p.contaminated_tokens, 0) AS contaminated_tokens,
       |       CASE WHEN len(tr.toks) > 0
       |            THEN 1000 * coalesce(p.contaminated_tokens, 0) // len(tr.toks)
       |            ELSE 0 END AS contaminated_permille
       |FROM tr LEFT JOIN per_doc p ON tr.doc_id = p.doc_id
       |ORDER BY tr.doc_id""".stripMargin
  }

  def substringShareSql(k: Int = spanSeedK): String =
    s"""WITH ${substringSpanCtes(k)},
       |per_doc AS (
       |  SELECT doc_id, count(*) AS n_spans,
       |         CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
       |  FROM spans GROUP BY doc_id)
       |SELECT tk.doc_id, CAST(len(tk.toks) AS BIGINT) AS n_tokens,
       |       coalesce(p.n_spans, 0) AS n_spans,
       |       coalesce(p.dup_tokens, 0) AS dup_tokens,
       |       CASE WHEN len(tk.toks) > 0
       |            THEN 1000 * coalesce(p.dup_tokens, 0) // len(tk.toks)
       |            ELSE 0 END AS dup_permille
       |FROM tk LEFT JOIN per_doc p ON tk.doc_id = p.doc_id
       |ORDER BY tk.doc_id""".stripMargin

  /** Golden-record survivorship — the master-data step AFTER duplicate
    * detection: each multi-member near-dup cluster collapses to one
    * canonical record (the cluster representative, i.e. the propagated
    * min id) with the surviving metadata merged across members —
    * member/source/language counts, total size, and the canonical-vs-
    * longest-member sizes (surfacing the two standard survivor policies
    * side by side). Composes the verified cluster kernel with one
    * cluster-keyed partial+final aggregate; output is cluster-count
    * sized. Singleton clusters are not records to merge and are
    * excluded. Note: canonical_chars can be NULL when a component's
    * diameter exceeds the bounded propagation rounds — the rep id then
    * carries a smaller label itself and its row lands in another
    * cluster (both engines agree; BehaviorSpec asserts presence only
    * when the rep row is a member of its own cluster). */
  def goldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val clusters = nearDupClusters(spark, dir).select("doc_id", "cluster_rep")
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    clusters.join(docs, "doc_id")
      .groupBy(col("cluster_rep").as("canonical_id"))
      .agg(count(lit(1)).as("n_members"),
        countDistinct("source").as("n_sources"),
        countDistinct("lang").as("n_langs"),
        sum("n_chars").as("total_chars"),
        min(when(col("doc_id") === col("cluster_rep"), col("n_chars")))
          .as("canonical_chars"),
        max("n_chars").as("max_member_chars"))
      .filter(col("n_members") >= 2)
      .orderBy("canonical_id")
  }

  val goldenRecordSql: String = {
    // strip ONLY the trailing ORDER BY — a global replace would corrupt
    // the oracle if that substring ever appeared inside the CTE chain
    // (e.g. a future window ORDER BY doc_id)
    require(nearDupClustersSql.endsWith("ORDER BY doc_id"),
      "nearDupClustersSql no longer ends with its ORDER BY — update goldenRecordSql's composition")
    val cl = nearDupClustersSql.stripSuffix("ORDER BY doc_id")
    s"""WITH cl AS ($cl)
       |SELECT cl.cluster_rep AS canonical_id, count(*) AS n_members,
       |       count(DISTINCT d.source) AS n_sources,
       |       count(DISTINCT d.lang) AS n_langs,
       |       CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
       |       min(CASE WHEN d.doc_id = cl.cluster_rep THEN d.n_chars END)
       |         AS canonical_chars,
       |       max(d.n_chars) AS max_member_chars
       |FROM cl JOIN documents d ON cl.doc_id = d.doc_id
       |GROUP BY cl.cluster_rep HAVING count(*) >= 2
       |ORDER BY canonical_id""".stripMargin
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS algorithm): per document, the ORDERED token-3-gram hash
    * sequence is scanned with a sliding window of w=8, keeping each
    * window's MINIMUM hash as a fingerprint. The guarantee (§2 of the
    * paper): any token run of length ≥ w+k−1 = 10 shared by two
    * documents yields at least one shared fingerprint — detection is
    * certain, not probabilistic like minhash, while storing ~2/(w+1)
    * of the grams. Candidate pairs come from the fingerprint inverted
    * index (df-capped like every candidate generator on this board).
    * All sharing pairs are kept — the guarantee promises exactly ONE
    * shared fingerprint for a minimal run (the interior window minima
    * dedup to a single gram), so thresholding on n_shared > 1 would
    * break it; n_shared is reported for consumers to rank on.
    *
    * Unlike [[shingles]], the gram sequence here is NOT distinct —
    * winnowing is positional. The gram frame is staged before the
    * window pass (the CollapseProject re-run trap documented on
    * [[shingleTable]] applies doubly: `slice` touches w elements per
    * window).
    *
    * Scale shape: per-doc O(n·w) maps → explode of the SELECTED
    * fingerprints only (~2/(w+1) density) → df-capped equi-join;
    * never all-pairs, never a global sort. */
  def winnowingPairs(spark: SparkSession, dir: String,
                     w: Int = 8, dfCap: Int = 20): DataFrame = {
    val tk = t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .staged
    val grams = tk.select(col("doc_id"),
      when(size(col("toks")) >= 3,
        transform(sequence(lit(1), size(col("toks")) - 2),
          i => Portable.hash60(concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))))
        .otherwise(array(Portable.hash60(concat_ws(" ", col("toks"))))).as("hs"))
      .staged
    val fps = grams.select(col("doc_id"),
      explode(array_distinct(
        transform(sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(1))),
          i => array_min(slice(col("hs"), i, lit(w)))))).as("fp"))
    val capped = fps.join(
      fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap).select("fp"), Seq("fp"))
    capped.select(col("doc_id").as("a"), col("fp"))
      .join(capped.select(col("doc_id").as("b"), col("fp")), Seq("fp"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
      .orderBy("a", "b")
  }

  def winnowingPairsSql(w: Int = 8, dfCap: Int = 20): String =
    s"""WITH tk AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |g AS (
       |  SELECT doc_id,
       |         CASE WHEN len(toks) >= 3
       |           THEN list_transform(generate_series(1, len(toks) - 2),
       |                  i -> CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1]
       |                             || ' ' || toks[i+2]), 1, 15)) AS BIGINT))
       |           ELSE [CAST(('0x' || substr(md5(array_to_string(toks, ' ')), 1, 15))
       |                 AS BIGINT)]
       |         END AS hs
       |  FROM tk
       |), f AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_transform(
       |           generate_series(1, greatest(len(hs) - ${w - 1}, 1)),
       |           i -> list_min(hs[i:i+${w - 1}])))) AS fp
       |  FROM g
       |), capped AS (
       |  SELECT f.doc_id, f.fp FROM f
       |  JOIN (SELECT fp, count(*) AS df FROM f GROUP BY fp) d ON f.fp = d.fp
       |  WHERE d.df <= $dfCap
       |)
       |SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared
       |FROM capped x JOIN capped y ON x.fp = y.fp AND x.doc_id < y.doc_id
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** b-bit minhash (Li & König 2010, b=1): keep only the LOWEST BIT of
    * each of 64 minhash permutations and pack the whole signature into
    * ONE BIGINT — 8 bytes per document instead of 64 perms × 8 bytes,
    * the storage move that makes billion-document similarity indexes
    * fit in memory. The estimator corrects for random 1-bit
    * collisions: with match fraction P = m/64 over the packed words
    * (m = 64 − popcount(wa XOR wb)), Ĵ = 2P − 1 clamped at 0 (the
    * b=1, C≈1/2 case of the paper's Eq. 5). The query computes packed
    * signatures for the WHOLE corpus (the production artifact: one
    * shuffle, map-side combine, same aggregate shape as
    * [[minhashSignatures]] at k=64), evaluates all pairs of the 32-doc
    * panel, and reports the estimate BESIDE the exact shingle Jaccard
    * — the estimator-vs-truth gate, like [[minhashEstimates]].
    *
    * Scale shape: corpus touched once for the signature agg; the pair
    * evaluation is panel-bounded (496 rows); exact Jaccard for the
    * gate runs on the panel's shingle sets only. */
  def bbitMinhash(spark: SparkSession, dir: String,
                  k: Int = 64, panel: Int = 32): DataFrame = {
    val mins = (0 until k).map(i =>
      min(pmod(lit(uhA(i)) * col("hp") + lit(uhB(i)), lit(P))).as(s"mh$i"))
    val words = shingleTable(spark, dir)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), pmod(Portable.hash60(col("shingle")), lit(P)).as("hp"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        (0 until k).map(i => shiftleft(pmod(col(s"mh$i"), lit(2L)), i))
          .reduce(_ + _).as("word"))
    val pw = words.filter(col("doc_id") < panel).staged
    val pairs = pw.select(col("doc_id").as("a"), col("word").as("wa"))
      .join(broadcast(pw.select(col("doc_id").as("b"), col("word").as("wb"))),
        col("a") < col("b"))
      .select(col("a"), col("b"),
        (lit(k.toLong) - bit_count(col("wa").bitwiseXOR(col("wb"))).cast("long"))
          .as("m_bits"))
      .withColumn("est_permille",
        greatest(lit(0L), expr(s"(1000 * (2 * m_bits - $k)) DIV $k")))
    val psh = shingleTable(spark, dir).filter(col("doc_id") < panel)
      .select(col("doc_id"), explode(col("sh")).as("shingle")).staged
    val sizes = psh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = psh.select(col("doc_id").as("a"), col("shingle"))
      .join(psh.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("a", "b"), "left")
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .select(col("a"), col("b"), col("m_bits"), col("est_permille"),
        expr("(1000 * inter) DIV (na + nb - inter)").as("exact_permille"))
      .orderBy("a", "b")
  }

  def bbitMinhashSql(k: Int = 64, panel: Int = 32): String = {
    val minExprs = (0 until k).map(i =>
      s"min((${uhA(i)} * hp + ${uhB(i)}) % $P) AS mh$i").mkString(",\n|         ")
    val matchTerms = (0 until k).map(i =>
      s"CASE WHEN x.mh$i % 2 = y.mh$i % 2 THEN 1 ELSE 0 END").mkString(" + ")
    s"""$shingleTableSql,
       |sh AS (SELECT doc_id, unnest(st.sh) AS shingle FROM st WHERE doc_id < $panel),
       |hp AS (SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % $P) AS hp FROM sh),
       |mh AS (SELECT doc_id, $minExprs FROM hp GROUP BY doc_id),
       |pairs AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b,
       |         CAST($matchTerms AS BIGINT) AS m_bits
       |  FROM mh x JOIN mh y ON x.doc_id < y.doc_id
       |),
       |est AS (
       |  SELECT a, b, m_bits,
       |         greatest(0, (1000 * (2 * m_bits - $k)) // $k) AS est_permille
       |  FROM pairs
       |),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT e.a, e.b, e.m_bits, e.est_permille,
       |       (1000 * coalesce(i.inter, 0)) // (sa.n_sh + sb.n_sh - coalesce(i.inter, 0))
       |         AS exact_permille
       |FROM est e
       |LEFT JOIN inter i ON e.a = i.a AND e.b = i.b
       |JOIN sizes sa ON e.a = sa.doc_id
       |JOIN sizes sb ON e.b = sb.doc_id
       |ORDER BY e.a, e.b""".stripMargin
  }

  /** Content-defined chunking (the rsync/LBFS/Borg boundary rule,
    * token-level): position i ends a chunk iff hash(tok_i) % 2^k == 0
    * (expected chunk length 2^k = 16 tokens) — boundaries depend only
    * on LOCAL content, so an insertion early in a document shifts
    * chunk CONTENTS by one token but leaves every later boundary
    * intact, which is why CDC dedup survives edits that defeat
    * fixed-size blocking. Chunks are identified by an order-sensitive
    * CHUNK-RELATIVE positional fold of their token hashes
    * (Σ (j−start+1)·h_j mod p, computed as s1 − start·s0 from plain
    * sums — relative, or the identity would break on exactly the
    * shifted-content case CDC exists for; the planted-insertion spec
    * guards this), and the report counts cross-document duplicate
    * chunks and the
    * share of token mass they cover — the dedup-savings estimate a
    * storage or corpus team reads off first.
    *
    * Scale shape: per-token maps (boundary flag is a pure hash), ONE
    * doc-partitioned window (cumulative boundary count = chunk id),
    * chunk-keyed fold agg, then a chunk-hash-keyed count — all
    * bounded-key shuffles, never all-pairs. */
  def cdcChunks(spark: SparkSession, dir: String, modBits: Int = 4): DataFrame = {
    val mask = (1L << modBits) - 1
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text")))
        .as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        Portable.hash60(col("tok")).as("h"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = toks
      .withColumn("chunk", coalesce(sum(when((col("h") % (mask + 1)) === 0L, 1L)
        .otherwise(0L)).over(w), lit(0L)))
      .groupBy("doc_id", "chunk")
      .agg(count(lit(1)).as("n_tok"),
        (sum((col("pos") + 1L) * pmod(col("h"), lit(1000003L)))
          - min("pos") * sum(pmod(col("h"), lit(1000003L)))).as("sig"))
      .staged
    val dupSigs = chunks.groupBy("n_tok", "sig")
      .agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") >= 2)
    val dupChunks = chunks.join(dupSigs, Seq("n_tok", "sig"), "left_semi")
    val tot = chunks.agg(count(lit(1)).as("n_chunks"), sum("n_tok").as("n_tokens"))
    val dup = dupChunks.agg(count(lit(1)).as("n_dup_chunks"),
      coalesce(sum("n_tok"), lit(0L)).as("n_dup_tokens"))
    tot.crossJoin(broadcast(dup))
      .select(col("n_chunks"), col("n_tokens"), col("n_dup_chunks"),
        col("n_dup_tokens"),
        expr("(1000 * n_dup_tokens) DIV n_tokens").as("dup_permille"))
  }

  def cdcChunksSql(modBits: Int = 4): String = {
    val mod = 1L << modBits
    s"""WITH tk AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |pos AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |         ('0x' || substr(md5(toks[i]), 1, 15))::BIGINT AS h
       |  FROM tk, unnest(generate_series(1, len(toks))) AS u(i)
       |  WHERE len(toks) > 0
       |), ch AS (
       |  SELECT doc_id, pos, h,
       |         CAST(coalesce(sum(CASE WHEN h % $mod = 0 THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |           AS chunk
       |  FROM pos
       |), chunks AS (
       |  SELECT doc_id, chunk, count(*) AS n_tok,
       |         CAST(sum((pos + 1) * (h % 1000003))
       |              - min(pos) * sum(h % 1000003) AS BIGINT) AS sig
       |  FROM ch GROUP BY doc_id, chunk
       |), dup_sigs AS (
       |  SELECT n_tok, sig FROM chunks
       |  GROUP BY n_tok, sig HAVING count(DISTINCT doc_id) >= 2
       |), tot AS (
       |  SELECT count(*) AS n_chunks, CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM chunks
       |), dup AS (
       |  SELECT count(*) AS n_dup_chunks,
       |         CAST(coalesce(sum(c.n_tok), 0) AS BIGINT) AS n_dup_tokens
       |  FROM chunks c JOIN dup_sigs d ON c.n_tok = d.n_tok AND c.sig = d.sig
       |)
       |SELECT n_chunks, n_tokens, n_dup_chunks, n_dup_tokens,
       |       (1000 * n_dup_tokens) // n_tokens AS dup_permille
       |FROM tot CROSS JOIN dup""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cdc_chunks" -> ((s, d) => cdcChunks(s, d)),
    "dedup_bbit_minhash" -> ((s, d) => bbitMinhash(s, d)),
    "dedup_winnowing" -> ((s, d) => winnowingPairs(s, d)),
    "dedup_golden_record" -> goldenRecord,
    "dedup_neardup_clusters" -> nearDupClusters,
    "dedup_exact" -> exact,
    "dedup_soft_weights" -> softWeights,
    "dedup_soft_weights_near" -> softWeightsNear,
    "dedup_minhash_bands" -> ((s, d) => minhashBands(s, d)),
    "dedup_minhash_candidates" -> minhashCandidates,
    "dedup_minhash_cjk" -> minhashCandidatesCjk,
    "dedup_minhash_est" -> ((s, d) => minhashEstimates(s, d)),
    "dedup_incremental" -> incrementalCandidates,
    "dedup_simhash" -> simhash,
    "dedup_simhash_pairs" -> simhashPairs,
    "dedup_simhash_incremental" -> simhashIncremental,
    "dedup_jaccard_pairs" -> ((s, d) => jaccardPairs(s, d)),
    "dedup_threshold_curve" -> ((s, d) => thresholdCurve(s, d)),
    "dedup_containment" -> ((s, d) => containmentPairs(s, d)),
    "dedup_edit_verify" -> ((s, d) => editVerify(s, d)),
    "dedup_repeated_spans" -> ((s, d) => repeatedSpans(s, d)),
    "dedup_substring_spans" -> ((s, d) => substringSpans(s, d)),
    "dedup_substring_cjk" -> ((s, d) => substringSpansCjk(s, d)),
    "dedup_substring_share" -> ((s, d) => substringShare(s, d)),
    "dedup_substring_removal" -> ((s, d) => substringRemoval(s, d)),
    "dedup_contamination_mask" -> ((s, d) => contaminationMask(s, d)))

  val oracles: Map[String, String] = Map(
    "dedup_cdc_chunks" -> cdcChunksSql(),
    "dedup_bbit_minhash" -> bbitMinhashSql(),
    "dedup_winnowing" -> winnowingPairsSql(),
    "dedup_golden_record" -> goldenRecordSql,
    "dedup_neardup_clusters" -> nearDupClustersSql,
    "dedup_exact" -> exactSql,
    "dedup_soft_weights" -> softWeightsSql,
    "dedup_soft_weights_near" -> softWeightsNearSql,
    "dedup_minhash_bands" -> minhashBandsSql(),
    "dedup_minhash_candidates" -> minhashCandidatesSql,
    "dedup_minhash_cjk" -> minhashCandidatesCjkSql,
    "dedup_minhash_est" -> minhashEstimatesSql(),
    "dedup_incremental" -> incrementalCandidatesSql,
    "dedup_simhash" -> simhashSql,
    "dedup_simhash_pairs" -> simhashPairsSql,
    "dedup_simhash_incremental" -> simhashIncrementalSql,
    "dedup_jaccard_pairs" -> jaccardPairsSql(),
    "dedup_threshold_curve" -> thresholdCurveSql,
    "dedup_containment" -> containmentPairsSql(),
    "dedup_edit_verify" -> editVerifySql(),
    "dedup_repeated_spans" -> repeatedSpansSql(),
    "dedup_substring_spans" -> substringSpansSql(),
    "dedup_substring_cjk" -> substringSpansCjkSql(),
    "dedup_substring_share" -> substringShareSql(),
    "dedup_substring_removal" -> substringRemovalSql(),
    "dedup_contamination_mask" -> contaminationMaskSql())
}
