package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Tables.t
import graft.functions.Portable
import graft.Cache.CacheOps

/** K-means clustering over the embedding column, and the curation
  * operators built on it (SemDeDup-style semantic dedup, cluster-balanced
  * representative sampling). The IVF index (Similarity.ivfTopK) uses
  * stand-in centroids; this is the real trained-quantizer path.
  *
  * Numeric strategy: Lloyd's iterations run entirely in the fixed-point
  * integer domain (Portable.quantize). Distances are exact BIGINTs
  * (‖v‖² − 2·v·c + ‖c‖²), argmin ties break on the lowest cluster id
  * (lexicographic min over (dist, cid) structs), and centroid means use exact
  * integer floor division ((s − pmod(s, n)) div n) — so every iteration
  * produces bit-identical centroids in Spark and the DuckDB oracle, and
  * the unrolled-CTE oracle can replay the whole training run.
  *
  * Scale design (100 TB):
  *  - Assignment is a broadcast of the K×d centroid model (O(K·d), never
  *    data-scaled) against a single corpus map stage — the standard
  *    distributed Lloyd's shape (cf. Spark MLlib KMeans).
  *  - Centroid recompute is one map-side-combinable aggregation: d
  *    per-component SUM columns + COUNT per cluster — partial aggregates
  *    per partition, one K-row shuffle. No posexplode (which would
  *    shuffle d× the corpus rows).
  *  - The corpus is scanned once per iteration; iterations are fixed
  *    (ITERS), so total cost is ITERS corpus scans + ITERS tiny shuffles.
  *  - SemDeDup: the candidate join key is (cluster, band, bucket) — the
  *    trained partition PLUS the OR-amplified hyperplane bands, strictly
  *    tighter than either alone. K grows with the corpus (E[cluster size]
  *    stays bounded), so within-cluster candidates never degenerate to
  *    all-pairs. Exact cosine verifies every candidate — false positives
  *    are impossible; the all-pairs DuckDB oracle proves the bucketed
  *    path lossless on the test corpus.
  *
  * Reference context: the reference engine (hashTable.cuh, table.cuh) has
  * no clustering surface; this family extends the engine for the
  * training-data-curation workloads the survey targets (SemDeDup:
  * Abbas et al. 2023, arXiv:2303.09540).
  */
object Clustering {

  private val dims = 64
  private val K = 8
  private val iters = 3
  private val nPlanes = 16
  private val nBands = 4
  private val bandBits = nPlanes / nBands

  // ---------------------------------------------------------------------
  // Spark side
  // ---------------------------------------------------------------------

  /** Quantized corpus (vec_id, q, nsq), repartitioned off the single-file
    * scan (no-op at production scale). */
  private def qn(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizedFrom(t(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id")))

  /** Deterministic init: the first K vectors are the seed centroids. */
  private def initCentroids(corpus: DataFrame): DataFrame =
    corpus.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("c"))
      .withColumn("csq", Portable.normSqQ(col("c")))

  /** One assignment pass: nearest centroid by exact integer distance,
    * ties to the lowest cid. The K centroids pack into ONE broadcast row
    * (array of structs), so scoring + argmin run entirely map-side —
    * array_min over struct(dist, cid) is the lexicographic argmin — with
    * no K-way row fanout and NO per-vector window shuffle. Output:
    * vec_id, q, nsq, cid, dist. */
  private[graft] def assign(corpus: DataFrame, cent: DataFrame): DataFrame = {
    val packed = cent.agg(collect_list(struct(col("cid"), col("c"), col("csq"))).as("cents"))
    corpus.crossJoin(broadcast(packed))
      .withColumn("best", array_min(transform(col("cents"), ct =>
        struct(
          (col("nsq") - lit(2L) * Portable.dotQ(col("q"), ct.getField("c"))
            + ct.getField("csq")).as("dist"),
          ct.getField("cid").as("cid")))))
      .select(col("vec_id"), col("q"), col("nsq"),
        col("best").getField("cid").as("cid"),
        col("best").getField("dist").as("dist"))
  }

  /** Centroid recompute: d map-side-combinable SUMs + COUNT per cluster,
    * then exact integer floor-division means. Empty clusters drop (both
    * engines agree: no rows → no centroid). */
  private def recompute(assigned: DataFrame): DataFrame = {
    val sums = (0 until dims).map(i =>
      sum(element_at(col("q"), i + 1)).as(s"s$i"))
    val comps: Seq[Column] = (0 until dims).map(i =>
      expr(s"(s$i - pmod(s$i, cnt)) div cnt"))
    val aggCols = count(lit(1)).as("cnt") +: sums
    assigned.groupBy(col("cid"))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("cid"), array(comps: _*).as("c"))
      .withColumn("csq", Portable.normSqQ(col("c")))
  }

  /** Train `iters` Lloyd's rounds; returns (corpus, finalCentroids). The
    * corpus materializes once (read every iteration + final assignment);
    * each centroid model is K rows — checkpointed so iteration N+1's plan
    * doesn't re-nest iteration N's.
    *
    * The trained model is MEMOIZED per (session, dir): the harness
    * queries in this family (kmeans, semdedup, trained IVF, incremental
    * assignment, cluster quality, balanced sampling) share one training
    * run (train once, apply many — the real pipeline shape), mirroring
    * the aria drain memo.
    * Bench evicts between timing passes so each pass re-pays training. */
  private val cache =
    new java.util.HashMap[SparkSession, Map[String, (DataFrame, DataFrame)]]

  /** Drop this session's memoized trainings (Bench, between passes). */
  private[graft] def evictTrained(spark: SparkSession): Unit =
    cache.synchronized { cache.remove(spark); () }

  private[graft] def train(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    cache.synchronized {
      cache.keySet.removeIf(s => s.sparkContext.isStopped)
      val perSession = cache.getOrDefault(spark, Map.empty)
      perSession.get(dir) match {
        case Some(t) => t
        case None =>
          val corpus = qn(spark, dir).staged
          var cent = initCentroids(corpus)
          for (_ <- 1 to iters)
            // Lloyd loop state: the lineage CUT is the point (round k's
            // plan must not nest all rounds < k), so this stays
            // localCheckpoint under every Cache mode — see graft.Cache.
            cent = recompute(assign(corpus, cent)).localCheckpoint(false)
          cache.put(spark, perSession + (dir -> ((corpus, cent))))
          (corpus, cent)
      }
    }

  /** Per-cluster training report: size, exact integer inertia
    * (Σ ‖v−c‖², the `dist` column is already the squared distance), and
    * the centroid component sum (pins the full trained model, not just
    * the partition). */
  def kmeans(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, cent) = train(spark, dir)
    val fin = assign(corpus, cent)
    fin.groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n"), sum(col("dist")).as("inertia"))
      .join(cent.select(col("cid").as("cluster_id"),
        aggregate(col("c"), lit(0L), _ + _).as("centroid_sum")), Seq("cluster_id"))
      .orderBy("cluster_id")
  }

  /** Cluster-balanced representative sampling: the `perCluster` vectors
    * closest to their trained centroid — the "diverse coverage" sampling
    * step of a curation pipeline (one representative slice per semantic
    * region instead of a global top-k that collapses to the densest
    * region). Window is partitioned by cluster → no global sort. */
  def clusterBalancedSample(spark: SparkSession, dir: String,
                            perCluster: Int = 3): DataFrame = {
    val (corpus, cent) = train(spark, dir)
    assign(corpus, cent)
      .select(col("cid").as("cluster_id"), col("vec_id"), col("dist"),
        row_number().over(
          Window.partitionBy("cid").orderBy(col("dist"), col("vec_id")))
          .cast("long").as("rank"))
      .filter(col("rank") <= perCluster)
      .orderBy("cluster_id", "rank")
  }

  /** SemDeDup: semantic near-duplicate pruning inside trained clusters.
    * Candidates = pairs agreeing on (cluster, band, bucket); exact cosine
    * ≥ τ verifies; the keep rule is "lowest vec_id wins". Like
    * sim_neardup_pairs, the harness corpus has no natural near-dups (max
    * pair cosine ≈ 0.51), so the entry SELF-PLANTS the first 8 vectors
    * (vec_id + plant_base, dim-0 nudged +1, cosine ≈ 0.9999) AFTER
    * training — the trained quantizer is planted-data-free, and the query
    * must recover exactly the 8 planted pairs through the
    * cluster+band-bucketed path. */
  def semDedup(spark: SparkSession, dir: String, tau: Double = 0.9): DataFrame = {
    val (corpus, cent) = train(spark, dir)
    val planted = corpus.filter(col("vec_id") < 8)
      .crossJoin(broadcast(corpus.agg((max("vec_id") + 1L).as("plant_base"))))
      .select((col("vec_id") + col("plant_base")).as("vec_id"),
        zip_with(col("q"), sequence(lit(0), lit(dims - 1)),
          (x, i) => x + when(i === 0, 1L).otherwise(0L)).as("q"))
      .withColumn("nsq", Portable.normSqQ(col("q")))
    // corpus + plants, assigned and signed once; feeds both join sides
    val withPlants = corpus.unionByName(planted).staged
    val all = assign(withPlants, cent)
      .join(Similarity.lshSignaturesFrom(withPlants), "vec_id")
      .staged
    val buckets = all
      .select(col("vec_id"), col("cid"), col("q"), col("nsq"), col("signature"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bucket",
        expr(s"shiftright(signature, band * $bandBits) & ${(1 << bandBits) - 1}"))
      .drop("signature")
    val l = buckets.select(col("cid"), col("band"), col("bucket"),
      col("vec_id").as("keep_id"), col("q").as("qa"), col("nsq").as("na"))
    val r = buckets.select(col("cid"), col("band"), col("bucket"),
      col("vec_id").as("drop_id"), col("q").as("qb"), col("nsq").as("nb"))
    l.join(r, Seq("cid", "band", "bucket"))
      .filter(col("keep_id") < col("drop_id"))
      .select(col("cid").as("cluster_id"), col("keep_id"), col("drop_id"),
        (Portable.dotQ(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cosine"))
      .filter(col("cosine") >= tau)
      .distinct()
      .orderBy("cluster_id", "keep_id", "drop_id")
  }

  /** Per-semantic-cluster corpus quality report — the curation decision
    * surface the trained clusters exist FOR: which semantic regions are
    * low-quality / repetitive (drop or down-weight the region, not
    * individual docs — the SemDeDup-paper companion move). Embeddings
    * align 1:1 with documents (vec_id = doc_id), so this joins the text
    * table's integer quality signals to the trained assignment.
    * Exactness: per-cluster aggregates are SUMs of per-doc integers
    * (chars, tokens, distinct tokens) — no double summation anywhere
    * (float sums are partial-order-dependent in Spark); the repetition
    * ratio divides the exact integer totals once at the end. */
  def clusterQuality(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis.tokens
    val (corpus, cent) = train(spark, dir)
    val docs = t(spark, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("chars"),
        size(col("toks")).cast("long").as("toks_n"),
        size(array_distinct(col("toks"))).cast("long").as("toks_d"))
    assign(corpus, cent)
      .select(col("vec_id").as("doc_id"), col("cid"))
      .join(docs, Seq("doc_id"))
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chars")).as("sum_chars"),
        sum(col("toks_n")).as("sum_tokens"),
        sum(col("toks_d")).as("sum_distinct"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("repetition",
        lit(1.0) - col("sum_distinct").cast("double") / col("sum_tokens").cast("double"))
      .orderBy("cluster_id")
  }

  def clusterQualitySql: String =
    s"""WITH $kmeansCtes,
       |docs AS (
       |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS chars,
       |         CAST(len(${graft.text.TextAnalysis.tokSql}) AS BIGINT) AS toks_n,
       |         CAST(len(list_distinct(${graft.text.TextAnalysis.tokSql})) AS BIGINT) AS toks_d
       |  FROM documents)
       |SELECT f.cid AS cluster_id, count(*) AS n_docs,
       |       CAST(sum(d.chars) AS BIGINT) AS sum_chars,
       |       CAST(sum(d.toks_n) AS BIGINT) AS sum_tokens,
       |       CAST(sum(d.toks_d) AS BIGINT) AS sum_distinct,
       |       CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
       |       1.0 - CAST(sum(d.toks_d) AS DOUBLE) / CAST(sum(d.toks_n) AS DOUBLE) AS repetition
       |FROM fin f JOIN docs d ON f.vec_id = d.doc_id
       |GROUP BY f.cid ORDER BY cluster_id""".stripMargin

  /** Incremental assignment — the nightly-ingest shape for the trained
    * quantizer, mirroring dedup_incremental / sim_neardup_incremental:
    * only the DELTA batch (canonical split hash ≥ 90, standing in for
    * "arrived since the last run") is scored against the EXISTING
    * trained model; the base corpus is never rescored and the model is
    * never retrained. Cost: |delta| map-side distance evaluations
    * against the O(K·d) broadcast — the cheapest possible ingest path.
    * Output: per-cluster delta counts + delta inertia (what a nightly
    * drift monitor alerts on). */
  def kmeansIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, cent) = train(spark, dir)
    val delta = corpus.filter(
      graft.text.TextAnalysis.splitHash(col("vec_id")) >= 90)
    assign(delta, cent)
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("delta_n"), sum(col("dist")).as("delta_inertia"))
      .orderBy("cluster_id")
  }

  def kmeansIncrementalSql: String =
    s"""WITH $kmeansCtes,
       |delta AS (SELECT vec_id, qv, nsq FROM qn
       |          WHERE ${graft.text.TextAnalysis.splitHashSql.replace("doc_id", "vec_id")} >= 90),
       |adelta AS (${assignSql("delta", s"cent$iters")})
       |SELECT cid AS cluster_id, count(*) AS delta_n,
       |       CAST(sum(dist) AS BIGINT) AS delta_inertia
       |FROM adelta GROUP BY cid ORDER BY cluster_id""".stripMargin

  /** IVF search over the TRAINED quantizer — closes the loop
    * Similarity.ivfTopK leaves open (its centroids are a stand-in; these
    * are the Lloyd's-trained ones, same cells the curation operators
    * use). Cells = the final L2 assignment; a query probes its `nprobe`
    * L2-nearest cells (the trained quantizer's own metric) and ranks the
    * members by exact cosine. Probe selection is map-side (packed
    * centroid broadcast + array_sort argsort, no window); the search is
    * an equi-join on cell id — never a cross product. */
  def ivfTrainedTopK(spark: SparkSession, dir: String,
                     k: Int = 5, nprobe: Int = 2): DataFrame = {
    val (corpus, cent) = train(spark, dir)
    val cells = assign(corpus, cent)
      .select(col("vec_id").as("cand_id"), col("q").as("qb"),
        col("nsq").as("nb"), col("cid"))
      .staged
    val packed = cent.agg(collect_list(struct(col("cid"), col("c"), col("csq"))).as("cents"))
    val probes = corpus.filter(col("vec_id") < 8)
      .crossJoin(broadcast(packed))
      .withColumn("probe", explode(slice(array_sort(transform(col("cents"), ct =>
        struct(
          (col("nsq") - lit(2L) * Portable.dotQ(col("q"), ct.getField("c"))
            + ct.getField("csq")).as("dist"),
          ct.getField("cid").as("cid")))), 1, nprobe)))
      .select(col("vec_id").as("query_id"), col("q").as("qa"),
        col("nsq").as("na"), col("probe").getField("cid").as("cid"))
    probes.join(cells, Seq("cid"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        Portable.dotQ(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .select(col("query_id"), col("cand_id"), col("cosine"),
        row_number().over(
          Window.partitionBy("query_id").orderBy(desc("cosine"), col("cand_id")))
          .cast("long").as("rank"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** nprobe budget-recall CURVE for the trained IVF — the cell-count
    * analog of sim_ann_probe_curve: recall@k against exact cosine at
    * nprobe ∈ {1, 2, 4}, one row per budget (micro recall over the
    * panel), so the knob every IVF deployment tunes is pinned as a
    * curve, not the single point sim_ivf_recall carries. Probe
    * expansion is panel-side (≤ 8·Σbudgets rows before the cell
    * equi-join); each corpus vector lives in exactly one cell, so no
    * cross-budget dedup is needed. */
  def ivfProbeCurve(spark: SparkSession, dir: String, k: Int = 5,
                    budgets: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    val (corpus, cent) = train(spark, dir)
    val cells = assign(corpus, cent)
      .select(col("vec_id").as("cand_id"), col("q").as("qb"),
        col("nsq").as("nb"), col("cid"))
      .staged
    val packed = cent.agg(collect_list(struct(col("cid"), col("c"), col("csq"))).as("cents"))
    val maxP = budgets.max
    val probes = corpus.filter(col("vec_id") < 8)
      .crossJoin(broadcast(packed))
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nsq").as("na"),
        posexplode(slice(array_sort(transform(col("cents"), ct =>
          struct(
            (col("nsq") - lit(2L) * Portable.dotQ(col("q"), ct.getField("c"))
              + ct.getField("csq")).as("dist"),
            ct.getField("cid").as("cid")))), 1, maxP)))
      .select(col("query_id"), col("qa"), col("na"),
        col("pos"), col("col").getField("cid").as("cid"))
    val budgetF = spark.range(1)
      .select(explode(array(budgets.map(b => lit(b)): _*)).as("budget"))
    val top = probes.join(broadcast(budgetF), col("pos") < col("budget"))
      .join(cells, Seq("cid"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("budget"), col("query_id"), col("cand_id"),
        (Portable.dotQ(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cosine"))
      .select(col("budget"), col("query_id"), col("cand_id"),
        row_number().over(
          Window.partitionBy("budget", "query_id")
            .orderBy(desc("cosine"), col("cand_id"))).as("rank"))
      .filter(col("rank") <= k)
      .select(col("budget"), col("query_id"), col("cand_id"), lit(1L).as("hit"))
    val exact = ExactPanels.cosine(spark, dir, k)
    exact.crossJoin(broadcast(budgetF))
      .join(top, Seq("budget", "query_id", "cand_id"), "left")
      .groupBy("budget")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall",
        col("n_hits").cast("double") / col("n_exact").cast("double"))
      .orderBy("budget")
  }

  def ivfProbeCurveSql(k: Int = 5, budgets: Seq[Int] = Seq(1, 2, 4)): String = {
    val maxP = budgets.max
    val blist = budgets.mkString(", ")
    val cosSql = "CAST(CAST(list_sum(list_transform(generate_series(1, " + dims +
      "), i -> a.qv[i] * f.qv[i])) AS BIGINT) AS DOUBLE)" +
      " / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(f.nsq AS DOUBLE)))"
    s"""WITH $kmeansCtes,
       |probes AS (
       |  SELECT vec_id AS query_id, cid, rn - 1 AS pos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM (SELECT qn.vec_id, c.cid, ${distSql("qn", "c")} AS dist
       |          FROM qn CROSS JOIN cent$iters c
       |          WHERE qn.vec_id < 8)
       |  ) WHERE rn <= $maxP),
       |budgets AS (SELECT unnest([$blist]) AS budget),
       |cand AS (
       |  SELECT b.budget, p.query_id, f.vec_id AS cand_id, $cosSql AS cosine
       |  FROM probes p
       |  JOIN budgets b ON p.pos < b.budget
       |  JOIN fin f ON f.cid = p.cid AND f.vec_id <> p.query_id
       |  JOIN qn a ON a.vec_id = p.query_id),
       |top AS (
       |  SELECT budget, query_id, cand_id FROM (
       |    SELECT budget, query_id, cand_id,
       |           row_number() OVER (PARTITION BY budget, query_id
       |             ORDER BY cosine DESC, cand_id) AS rank
       |    FROM cand) WHERE rank <= $k),
       |exact AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |             CAST(CAST(list_sum(list_transform(generate_series(1, $dims),
       |               i -> a.qv[i] * b.qv[i])) AS BIGINT) AS DOUBLE)
       |               / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) DESC,
       |             b.vec_id) AS rank
       |    FROM qn a JOIN qn b ON a.vec_id <> b.vec_id
       |    WHERE a.vec_id < 8) WHERE rank <= $k)
       |SELECT b.budget, count(*) AS n_exact,
       |       CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS recall
       |FROM budgets b CROSS JOIN exact e
       |LEFT JOIN top t ON t.budget = b.budget AND t.query_id = e.query_id
       |  AND t.cand_id = e.cand_id
       |GROUP BY b.budget ORDER BY b.budget""".stripMargin
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle — the unrolled training replay
  // ---------------------------------------------------------------------

  private val quantizedSql: String =
    """q AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings
      |),
      |qn AS (
      |  SELECT vec_id, qv,
      |         CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
      |  FROM q
      |)""".stripMargin

  /** dist² of row alias `v` against centroid alias `c` (exact BIGINT). */
  private def distSql(v: String, c: String): String =
    s"""$v.nsq - 2*CAST(list_sum(list_transform(generate_series(1, $dims),
       |      i -> $v.qv[i] * $c.c[i])) AS BIGINT)
       |    + CAST(list_sum(list_transform($c.c, x -> x*x)) AS BIGINT)""".stripMargin

  /** Assignment CTE body: every row of `src` to its nearest centroid in
    * `cent`, ties to the lowest cid. */
  private def assignSql(src: String, cent: String): String =
    s"""SELECT vec_id, qv, nsq, cid, dist FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |  FROM (SELECT $src.vec_id, $src.qv, $src.nsq, $cent.cid,
       |               ${distSql(src, cent)} AS dist
       |        FROM $src CROSS JOIN $cent)
       |) WHERE rn = 1""".stripMargin

  /** Centroid recompute CTE body from assignment `a`: exact integer
    * floor-division means, reassembled per cluster in dim order. */
  private def recomputeSql(a: String): String =
    s"""SELECT cid, list(v ORDER BY i) AS c FROM (
       |  SELECT cid, i,
       |         CAST((sum(qv[i]) - ((sum(qv[i]) % count(*)) + count(*)) % count(*)) / count(*) AS BIGINT) AS v
       |  FROM $a CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS i) t
       |  GROUP BY cid, i)
       |GROUP BY cid""".stripMargin

  /** The full unrolled training chain: cent0, a1, cent1, …, cent$iters,
    * fin (final assignment of `qn` against cent$iters). */
  private def kmeansCtes: String =
    s"""$quantizedSql,
       |$kmeansCtesNoQuantize""".stripMargin

  /** The training chain WITHOUT the q/qn quantization prefix — for
    * composition with other oracle chains (Pq) that share the same
    * quantized corpus CTEs and must not redefine them. */
  private[graft] def kmeansCtesNoQuantize: String = {
    val rounds = (1 to iters).map { k =>
      s"""a$k AS (${assignSql("qn", s"cent${k - 1}")}),
         |cent$k AS (${recomputeSql(s"a$k")})""".stripMargin
    }.mkString(",\n")
    s"""cent0 AS (SELECT vec_id AS cid, qv AS c FROM qn WHERE vec_id < $K),
       |$rounds,
       |fin AS (${assignSql("qn", s"cent$iters")})""".stripMargin
  }

  /** Number of Lloyd's rounds — the final centroid CTE is
    * cent[[trainRounds]] in [[kmeansCtesNoQuantize]]. */
  private[graft] def trainRounds: Int = iters

  def kmeansSql: String =
    s"""WITH $kmeansCtes
       |SELECT f.cid AS cluster_id, count(*) AS n,
       |       CAST(sum(f.dist) AS BIGINT) AS inertia, cs.centroid_sum
       |FROM fin f
       |JOIN (SELECT cid, CAST(list_sum(c) AS BIGINT) AS centroid_sum
       |      FROM cent$iters) cs ON f.cid = cs.cid
       |GROUP BY f.cid, cs.centroid_sum
       |ORDER BY cluster_id""".stripMargin

  def clusterBalancedSampleSql(perCluster: Int = 3): String =
    s"""WITH $kmeansCtes
       |SELECT cid AS cluster_id, vec_id, dist, rank FROM (
       |  SELECT cid, vec_id, dist,
       |         row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rank
       |  FROM fin)
       |WHERE rank <= $perCluster ORDER BY cluster_id, rank""".stripMargin

  def ivfTrainedTopKSql(k: Int = 5, nprobe: Int = 2): String =
    s"""WITH $kmeansCtes,
       |probes AS (
       |  SELECT vec_id AS query_id, qv AS qa, nsq AS na, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM (SELECT qn.vec_id, qn.qv, qn.nsq, c.cid,
       |                 ${distSql("qn", "c")} AS dist
       |          FROM qn CROSS JOIN cent$iters c
       |          WHERE qn.vec_id < 8)
       |  ) WHERE rn <= $nprobe),
       |cells AS (SELECT vec_id AS cand_id, qv AS qb, nsq AS nb, cid FROM fin),
       |scored AS (
       |  SELECT query_id, cand_id,
       |         CAST(CAST(list_sum(list_transform(generate_series(1, $dims), i -> p.qa[i] * s.qb[i])) AS BIGINT) AS DOUBLE)
       |           / (sqrt(CAST(p.na AS DOUBLE)) * sqrt(CAST(s.nb AS DOUBLE))) AS cosine
       |  FROM probes p JOIN cells s USING (cid)
       |  WHERE p.query_id <> s.cand_id
       |),
       |final_rank AS (
       |  SELECT query_id, cand_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, cand_id, cosine, rank FROM final_rank
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** The 16×64 hyperplane matrix literal (same derivation as
    * Similarity.planeSigns — shared constant). */
  private val planeSignsSql: String =
    Similarity.planeSigns.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  def semDedupSql(tau: Double = 0.9): String =
    s"""WITH $kmeansCtes,
       |plant_base AS (SELECT max(vec_id) + 1 AS pb FROM qn),
       |planted AS (
       |  SELECT qn.vec_id + pb.pb AS vec_id,
       |         list_transform(generate_series(1, $dims),
       |           i -> qv[i] + CASE WHEN i = 1 THEN 1 ELSE 0 END) AS qv
       |  FROM qn, plant_base pb WHERE qn.vec_id < 8),
       |qall AS (
       |  SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
       |  FROM (SELECT vec_id, qv FROM qn UNION ALL SELECT vec_id, qv FROM planted)),
       |afin AS (${assignSql("qall", s"cent$iters")}),
       |smat AS (SELECT $planeSignsSql AS m),
       |proj AS (
       |  SELECT vec_id, ps.p AS p,
       |         CAST(list_sum(list_transform(generate_series(1, $dims),
       |           i -> qv[i] * m[ps.p + 1][i])) AS BIGINT) AS proj
       |  FROM qall, smat, (SELECT unnest(generate_series(0, ${nPlanes - 1})) AS p) ps
       |),
       |sig AS (
       |  SELECT vec_id,
       |         CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS signature
       |  FROM proj GROUP BY vec_id),
       |side AS (
       |  SELECT a.vec_id, a.qv, a.nsq, a.cid, s.signature
       |  FROM afin a JOIN sig s ON a.vec_id = s.vec_id),
       |buckets AS (
       |  SELECT vec_id, qv, nsq, cid, b.band,
       |         (signature >> (b.band * $bandBits)) & ${(1 << bandBits) - 1} AS bucket
       |  FROM side, (SELECT unnest(generate_series(0, ${nBands - 1})) AS band) b)
       |SELECT DISTINCT a.cid AS cluster_id, a.vec_id AS keep_id, b.vec_id AS drop_id,
       |       CAST(list_sum(list_transform(generate_series(1, $dims),
       |         i -> a.qv[i] * b.qv[i])) AS DOUBLE)
       |         / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
       |FROM buckets a
       |JOIN buckets b ON a.cid = b.cid AND a.band = b.band AND a.bucket = b.bucket
       |             AND a.vec_id < b.vec_id
       |WHERE CAST(list_sum(list_transform(generate_series(1, $dims),
       |         i -> a.qv[i] * b.qv[i])) AS DOUBLE)
       |         / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) >= $tau
       |ORDER BY cluster_id, keep_id, drop_id""".stripMargin

  // ---------------------------------------------------------------------
  // k-center (farthest-point) diversity sampling
  // ---------------------------------------------------------------------

  private val kcK = 8

  /** Greedy k-center / farthest-point diversity sample (Gonzalez 1985,
    * the 2-approximation): seed = vec_id 0, then k−1 rounds of "pick the
    * vector farthest from every chosen center" — the coreset/diversity
    * selection a training pipeline runs to cover embedding space with a
    * tiny representative panel (the dual of dedup: maximize spread
    * instead of killing near-dups). Output: (step, vec_id, min_d2), the
    * selection order with each pick's squared distance to the panel —
    * min_d2 is non-increasing, and its last value is the covering
    * radius bound.
    *
    * Exactness: quantized integer vectors, d² = nsq_a + nsq_c − 2·a·c
    * in BIGINT, argmax tiebreak by vec_id.
    *
    * Scale shape: the chosen centers live as LITERALS in the scoring
    * expression (k·dims driver values — bounded like the epoch loop's
    * abort set, NOT data-sized), so each round is one map over the
    * staged corpus (a `least` chain of codegen'd dot products) + a
    * TakeOrdered(1) — partial top-1 per partition, never a global
    * sort. k−1 corpus scans total; no shuffle anywhere. */
  def kCenterSample(spark: SparkSession, dir: String): DataFrame = {
    val corpus = qn(spark, dir).staged
    def row3(r: org.apache.spark.sql.Row): (Long, Seq[Long], Long) =
      (r.getAs[Long]("vec_id"), r.getSeq[Long](1).toSeq, r.getAs[Long]("nsq"))
    val seed = row3(corpus.filter(col("vec_id") === 0L)
      .select("vec_id", "q", "nsq").collect()(0))
    var chosen = Seq((1L, seed._1, 0L))
    var centers = Seq(seed)
    for (step <- 2 to kcK) {
      val mdCol = centers.map { case (_, cq, cn) =>
        col("nsq") + lit(cn) - lit(2L) * Portable.dotQ(col("q"), typedLit(cq))
      }.reduce(least(_, _))
      val next = corpus.withColumn("md", mdCol)
        .orderBy(desc("md"), col("vec_id"))
        .select("vec_id", "q", "nsq", "md").limit(1).collect()(0)
      chosen :+= ((step.toLong, next.getAs[Long]("vec_id"), next.getAs[Long]("md")))
      centers :+= row3(next)
    }
    import spark.implicits._
    // the returned plan re-anchors the driver-side panel to the corpus
    // (membership-validated distributed result, not a bare local relation)
    corpus.join(broadcast(chosen.toDF("step", "vec_id", "min_d2")), "vec_id")
      .select("step", "vec_id", "min_d2").orderBy("step")
  }

  def kCenterSampleSql: String = {
    def dot(a: String, c: String): String =
      s"CAST(list_sum(list_transform(generate_series(1, $dims), i -> $a.qv[i] * $c.qv[i])) AS BIGINT)"
    val steps = (2 to kcK).map { i =>
      val mdExpr =
        if (i == 2) s"a.nsq + c.nsq - 2*${dot("a", "c")}"
        else s"LEAST(a.md, a.nsq + c.nsq - 2*${dot("a", "c")})"
      s"""m${i - 1} AS (
         |  SELECT a.vec_id, a.qv, a.nsq, $mdExpr AS md
         |  FROM ${if (i == 2) "qn" else s"m${i - 2}"} a CROSS JOIN c${i - 1} c
         |), c$i AS (
         |  SELECT * FROM m${i - 1} ORDER BY md DESC, vec_id LIMIT 1
         |)"""
    }.mkString(",\n")
    val out = (2 to kcK)
      .map(i => s"UNION ALL SELECT CAST($i AS BIGINT), vec_id, md FROM c$i")
      .mkString("\n")
    s"""WITH $quantizedSql,
       |c1 AS (SELECT vec_id, qv, nsq FROM qn WHERE vec_id = 0),
       |$steps
       |SELECT CAST(1 AS BIGINT) AS step, vec_id, CAST(0 AS BIGINT) AS min_d2 FROM c1
       |$out
       |ORDER BY step""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_kcenter" -> ((s, d) => kCenterSample(s, d)),
    "sim_kmeans" -> ((s, d) => kmeans(s, d)),
    "sim_semdedup" -> ((s, d) => semDedup(s, d)),
    "sim_ivf_trained" -> ((s, d) => ivfTrainedTopK(s, d)),
    "sim_ivf_probe_curve" -> ((s, d) => ivfProbeCurve(s, d)),
    "sim_kmeans_incremental" -> ((s, d) => kmeansIncremental(s, d)),
    "pipeline_cluster_quality" -> ((s, d) => clusterQuality(s, d)),
    "sample_cluster_balanced" -> ((s, d) => clusterBalancedSample(s, d)))

  val oracles: Map[String, String] = Map(
    "sample_kcenter" -> kCenterSampleSql,
    "sim_kmeans" -> kmeansSql,
    "sim_semdedup" -> semDedupSql(),
    "sim_ivf_trained" -> ivfTrainedTopKSql(),
    "sim_ivf_probe_curve" -> ivfProbeCurveSql(),
    "sim_kmeans_incremental" -> kmeansIncrementalSql,
    "pipeline_cluster_quality" -> clusterQualitySql,
    "sample_cluster_balanced" -> clusterBalancedSampleSql())
}
