package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Tables.t
import graft.functions.Portable
import graft.Cache.CacheOps

/** Graph-based ANN: a k-NN graph built with NN-Descent (Dong, Moses &
  * Li, WWW 2011) and searched with a fixed-width beam — the
  * graph-traversal index family (the serving regime HNSW/NSG occupy)
  * beside the quantization shelf (LSH / IVF / PQ / BQ in [[Similarity]]
  * and [[Pq]]).
  *
  * Why NN-Descent and not HNSW: HNSW insertion is inherently
  * sequential (each insert greedy-searches the graph built so far),
  * which serializes on the driver. NN-Descent is join+agg shaped — its
  * one primitive is "compare each point to its neighbors' neighbors",
  * a self-join of the current graph — so every round is a bounded
  * dataflow over the whole corpus at once, the same iteration
  * discipline as `graph_label_prop` / k-means Lloyd rounds.
  *
  * Build (bounded rounds, deterministic):
  *  - init: `degree` pseudo-random out-edges per vector from the
  *    portable hash, `dst = (src + 1 + h(src,j) mod (n-1)) mod n` —
  *    never self, reproducible in both engines. (vec_id is dense
  *    0..n-1 by the testdata contract; at ingest scale a dense id is
  *    assigned once, exactly like the TPC-H keys.)
  *  - round: candidates = one hop through the UNDIRECTED graph
  *    (u→v→w ⇒ u~w, Dong et al. §2.2's local join). Reverse edges are
  *    capped at `degree` per node and the local-join list (forward ∪
  *    reverse) is hash-sampled back down to `degree` (their ρ-SAMPLING,
  *    made deterministic), so a hub cannot make the self-join
  *    quadratic: candidate mass is ≤ n·degree² per round by
  *    construction — measured recall-neutral (0.900 either way at
  *    sf0.1) and ~2× cheaper per round.
  *  - keep: exact quantized cosine on (old ∪ candidate) pairs, top
  *    `degree` per node — integer dot products (Portable.quantize) so
  *    both engines rank identically; ties broken by dst.
  *
  * Search: beam search from each panel query's own out-edges — expand
  * the beam one undirected hop, re-score against the query, keep the
  * best `beam`, `beamRounds` times (greedy best-first restricted to a
  * per-round frontier; beam ∪ expansion is monotone so recall never
  * drops with more rounds). The recall gate prices the whole path
  * against the exact brute-force top-k like every other ANN arm.
  *
  * Scale shape: the build is per-round equi-joins + window top-k on
  * the BIGINT vec id — shuffles bounded by n·(2·degree)² candidate
  * rows; vectors ride one (src) + one (dst) equi-join against the
  * id-keyed corpus. The search side is panel-sized (8 queries ×
  * beam × degree candidates per round) with the corpus touched only
  * through the candidate equi-join — the 100 TB posture is an
  * in-memory graph (n·degree BIGINT pairs, ~128 GB/1e12 vectors at
  * degree 16 after delta-encoding) probed per query, which is exactly
  * what this dataflow degrades to when the panel is one query.
  *
  * Build-once-search-many is the real pipeline shape, so the built
  * graph is memoized per (session, dir) like Clustering.train /
  * Pq.codebooks; Bench evicts between passes.
  */
object NnDescent {

  private val dims = 64
  /** Graph out-degree K (also the reverse-edge cap). */
  private val degree = 16
  /** NN-Descent rounds — fixed budget; the recall gate prices it. */
  private val buildRounds = 4
  /** Beam width for the flagship top-k search. */
  private val beamWidth = 16
  private val beamRounds = 4
  private val topK = 5
  /** Budget axis of the beam curve (all ≥ topK: a beam narrower than
    * k truncates the return set, which measures nothing). */
  private val curveBeams = Seq(5L, 10L, 16L)

  // ---------------------------------------------------------------- build

  /** NOT `.staged`: a checkpointed frame is a LogicalRDD with no stats
    * (sizeInBytes defaults to huge), which would force every per-round
    * scoring join into sort-merge. Left as a plain plan, the scan's
    * real stats let Catalyst broadcast the vector side while it fits
    * and fall back to the vec_id-keyed shuffle join when it doesn't —
    * the adaptive behavior the 100 TB posture wants. Re-deriving the
    * quantize projection per consumer is one codegen'd map over the
    * scan. */
  private def quantizedPlan(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizedFrom(t(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id")))

  private def scorePairs(pairs: DataFrame, qn: DataFrame): DataFrame = {
    val a = qn.select(col("vec_id").as("src"), col("q").as("qa"), col("nsq").as("na"))
    val b = qn.select(col("vec_id").as("dst"), col("q").as("qb"), col("nsq").as("nb"))
    pairs.join(a, "src").join(b, "dst")
      .select(col("src"), col("dst"),
        (Portable.dotQ(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cosine"))
  }

  private def keepBest(scored: DataFrame): DataFrame =
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(desc("cosine"), col("dst"))))
      .filter(col("rn") <= degree).drop("rn")

  /** One NN-Descent round over graph (src, dst, cosine).
    *
    * The local-join list is built in ONE owner-keyed aggregation
    * (optimization round 16; was: a reverse-cap window + a union
    * DISTINCT + a hash-sample window = 3 exchanges per round): both
    * edge directions are tagged and shuffled ONCE to their owner node,
    * then the reverse cap (the `degree` smallest in-neighbors —
    * `slice(array_sort(rl))` ≡ the old `row_number ORDER BY rdst`
    * window), the forward∪reverse dedup (`array_distinct` ≡ the old
    * DISTINCT — both inputs are per-key duplicate-free, so overlap is
    * the only dup source), and the deterministic ρ-sample (sort by
    * (hash60(src_dst), dst), take `degree` — identical key and tie
    * order to the old window) all run map-side over the per-node
    * arrays. Candidate pairs also lost their standalone DISTINCT: the
    * union with g is deduplicated once before scoring either way.
    * Row-for-row identical output (the unchanged DuckDB oracle is the
    * proof); 7 → 4 exchanges per round, and the same fusion is the
    * 100 TB shape (per-node state is degree-bounded arrays). */
  private def round(g: DataFrame, qn: DataFrame): DataFrame = {
    val tagged = g
      .select(col("src").as("owner"), col("dst").as("nbr"), lit(true).as("fwd"))
      .unionAll(g.select(col("dst").as("owner"), col("src").as("nbr"),
        lit(false).as("fwd")))
    val und = tagged.groupBy("owner")
      .agg(collect_list(when(col("fwd"), col("nbr"))).as("fl"),
        collect_list(when(not(col("fwd")), col("nbr"))).as("rl"))
      .select(col("owner"),
        array_distinct(concat(col("fl"),
          slice(array_sort(col("rl")), 1, degree))).as("ua"))
      .select(col("owner"),
        transform(col("ua"), x => struct(
          Portable.hash60(concat(col("owner"), lit("_"), x)).as("h"),
          x.as("nbr"))).as("hs"))
      .select(col("owner").as("src"),
        transform(slice(array_sort(col("hs")), 1, degree),
          s => s.getField("nbr")).as("ds"))
    val undPairs = und.select(col("src"), explode(col("ds")).as("dst"))
    val a = undPairs.select(col("src"), col("dst").as("via"))
    val b = undPairs.select(col("src").as("via"), col("dst"))
    val cand = a.join(b, "via")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
    keepBest(scorePairs(cand.union(g.select("src", "dst")).distinct(), qn))
  }

  private val cache =
    new java.util.HashMap[SparkSession, Map[String, (DataFrame, DataFrame, DataFrame)]]

  /** Memoized SEARCH states (final beam frames), beside the build memo:
    * `sim_nndescent_recall` re-paid `nnDescentTopK`'s whole beam loop
    * (already run for `sim_nndescent_topk`) and
    * `sim_nndescent_insert_recall` re-paid the full 5-round insert
    * search (already run for `sim_nndescent_insert`) — search-once,
    * gate-many, the same shape as the build memo. Keys:
    * `"<dir>|beams|<widths>|<rounds>"`, `"<dir>|insert"`. */
  private val searchCache =
    new java.util.HashMap[SparkSession, Map[String, DataFrame]]

  private def memoSearch(spark: SparkSession, key: String)
                        (build: => DataFrame): DataFrame =
    searchCache.synchronized {
      searchCache.keySet.removeIf(s => s.sparkContext.isStopped)
      searchCache.getOrDefault(spark, Map.empty).get(key) match {
        case Some(v) => v
        case None =>
          val v = build
          searchCache.put(spark,
            searchCache.getOrDefault(spark, Map.empty) + (key -> v))
          v
      }
    }

  /** Drop this session's memoized graphs + search states (Bench,
    * between passes). */
  private[graft] def evictBuilt(spark: SparkSession): Unit = {
    cache.synchronized { cache.remove(spark); () }
    searchCache.synchronized { searchCache.remove(spark); () }
  }

  /** (qn, graph, undirected graph), built once per (session, dir). */
  private def built(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    cache.synchronized {
      cache.keySet.removeIf(s => s.sparkContext.isStopped)
      cache.getOrDefault(spark, Map.empty).get(dir) match {
        case Some(g) => g
        case None =>
          val qn = quantizedPlan(spark, dir)
          val nF = qn.agg(count(lit(1)).as("n"))
          val init = qn.select(col("vec_id").as("src"))
            .crossJoin(broadcast(nF))
            .select(col("src"), col("n"),
              explode(array((0 until degree).map(j => lit(j)): _*)).as("j"))
            .select(col("src"),
              pmod(col("src") + lit(1L) +
                pmod(Portable.hash60(concat(lit("nnd_"), col("src"), lit("_"), col("j"))),
                  col("n") - lit(1L)), col("n")).as("dst"))
            .distinct()
          var g = keepBest(scorePairs(init, qn)).cutRound
          for (_ <- 1 to buildRounds)
            // per-round lineage cut — iterative-drain rule (Cache.cut)
            g = round(g, qn).cutRound
          val und = g.select("src", "dst")
            .union(g.select(col("dst").as("src"), col("src").as("dst")))
            .distinct().staged
          val result = (qn, g, und)
          cache.put(spark, cache.getOrDefault(spark, Map.empty) + (dir -> result))
          result
      }
    }

  /** The built k-NN graph itself — `degree` best-found neighbors per
    * vector with their exact cosines (the artifact a serving system
    * ships; also the direct oracle on the build, independent of any
    * search path over it). */
  def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    val (_, g, _) = built(spark, dir)
    g.orderBy("src", "dst")
  }

  // --------------------------------------------------------------- search

  /** Beam search over the built graph, one beam per (budget, query).
    * Returns the final beams (beam, query_id, cand_id, cosine). */
  private def beams(spark: SparkSession, dir: String, widths: Seq[Long],
                    rounds: Int): DataFrame =
      memoSearch(spark, s"$dir|beams|${widths.mkString(",")}|$rounds") {
    val (qn, g, und) = built(spark, dir)
    val panel = qn.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nsq").as("na"))
    val hop = und.select(col("src").as("cand_id"), col("dst").as("next_id"))
    var bb = g.filter(col("src") < 8)
      .select(explode(array(widths.map(lit): _*)).as("beam"),
        col("src").as("query_id"), col("dst").as("cand_id"), col("cosine"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("beam", "query_id").orderBy(desc("cosine"), col("cand_id"))))
      .filter(col("rn") <= col("beam")).drop("rn")
    for (_ <- 1 to rounds) {
      val expand = bb.select(col("beam"), col("query_id"), col("cand_id"))
        .join(hop, "cand_id")
        .filter(col("next_id") =!= col("query_id"))
        .select(col("beam"), col("query_id"), col("next_id").as("cand_id"))
      val pool = bb.select("beam", "query_id", "cand_id").union(expand).distinct()
      val scored = pool
        .join(qn.select(col("vec_id").as("cand_id"), col("q").as("qb"),
          col("nsq").as("nb")), "cand_id")
        .join(broadcast(panel), "query_id")
        .select(col("beam"), col("query_id"), col("cand_id"),
          (Portable.dotQ(col("qa"), col("qb")).cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
            .as("cosine"))
      bb = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy("beam", "query_id").orderBy(desc("cosine"), col("cand_id"))))
        .filter(col("rn") <= col("beam")).drop("rn")
        .cutRound
    }
    bb
  }

  /** Flagship graph-ANN search: beam-search top-k for the fixed query
    * panel — same output shape as [[Similarity.cosineTopK]] so recall
    * joins on (query_id, cand_id). */
  def nnDescentTopK(spark: SparkSession, dir: String, k: Int = topK): DataFrame =
    beams(spark, dir, Seq(beamWidth.toLong), beamRounds)
      .select(col("query_id"), col("cand_id"), col("cosine"),
        row_number().over(
          Window.partitionBy("query_id").orderBy(desc("cosine"), col("cand_id")))
          .cast("long").as("rank"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")

  /** Recall@k of the graph path against the exact brute-force top-k —
    * the gate that prices the (degree, rounds, beam) budget, beside
    * the LSH/IVF/PQ/BQ gates. */
  def nnDescentRecall(spark: SparkSession, dir: String, k: Int = topK): DataFrame = {
    val exact = ExactPanels.cosine(spark, dir, k)
    val approx = nnDescentTopK(spark, dir, k)
      .select(col("query_id"), col("cand_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("query_id", "cand_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / col("n_exact").cast("double"))
      .orderBy("query_id")
  }

  /** Budget–recall curve over beam width (5/10/16), beside the LSH
    * probe curve and the IVF nprobe curve: one row per width, micro
    * recall over the panel. On the harness corpus the curve saturates
    * by width 5 — the report that PROVES the narrow beam is safe,
    * which is the tuning decision a serving deployment makes. */
  def beamCurve(spark: SparkSession, dir: String, k: Int = topK): DataFrame = {
    val top = beams(spark, dir, curveBeams, beamRounds)
      .withColumn("rank", row_number().over(
        Window.partitionBy("beam", "query_id").orderBy(desc("cosine"), col("cand_id"))))
      .filter(col("rank") <= k)
      .select(col("beam"), col("query_id"), col("cand_id"), lit(1L).as("hit"))
    val exact = ExactPanels.cosine(spark, dir, k)
    val budgets = spark.range(1)
      .select(explode(array(curveBeams.map(lit): _*)).as("beam"))
    exact.crossJoin(broadcast(budgets))
      .join(top, Seq("beam", "query_id", "cand_id"), "left")
      .groupBy("beam")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / col("n_exact").cast("double"))
      .orderBy("beam")
  }

  // ------------------------------------------------------ insert path

  /** Beam rounds for the insert search — one more than the panel
    * search: insert starts from a FIXED entry set instead of the
    * query's own neighborhood, so it pays an extra hop of travel. */
  private val insertRounds = 5

  private def splitH(c: org.apache.spark.sql.Column) =
    graft.text.TextAnalysis.splitHash(c)

  /** INSERT path — the HNSW-style maintenance step a serving system
    * runs as new vectors arrive: each DELTA vector (the canonical
    * hash split ≥ 90, standing in for "arrived since the index was
    * built", like [[Pq]]'s and [[Similarity]]'s incremental arms)
    * beam-searches the BASE graph from a fixed entry set (the
    * `degree` smallest base ids) and emits its top-k attach edges —
    * exactly the neighbor list an insert would link. The base graph
    * is the session's built index PROJECTED to base→base edges (each
    * base node keeps its best surviving neighbors) — the
    * "index-before-the-delta" surface, reusing the memoized build
    * instead of paying a second one.
    *
    * Scale shape: the entry set is model-sized (broadcast cross —
    * |delta|·degree seed rows from one map stage); each round is one
    * equi-join through the base adjacency + one scoring join against
    * the id-keyed corpus + a (query)-windowed top-beam — all keyed
    * shuffles, delta-sized, never corpus². The recall gate prices the
    * whole path against the exact delta×base brute force. */
  /** The insert search's final beam state, memoized (search-once,
    * gate-many: the insert query and its recall gate share it). */
  private def insertBeams(spark: SparkSession, dir: String): DataFrame =
      memoSearch(spark, s"$dir|insert") {
    val (qn, g, _) = built(spark, dir)
    val bg = g.filter(splitH(col("src")) < 90 && splitH(col("dst")) < 90)
    val ubi = bg.select("src", "dst")
      .union(bg.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().staged // read every insert round
    val dq = qn.filter(splitH(col("vec_id")) >= 90)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nsq").as("na"))
    val ent = qn.filter(splitH(col("vec_id")) < 90)
      .orderBy("vec_id").limit(degree)
      .select(col("vec_id").as("cand_id"), col("q").as("qb"), col("nsq").as("nb"))
    val hop = ubi.select(col("src").as("cand_id"), col("dst").as("next_id"))
    var bb = dq.crossJoin(broadcast(ent))
      .select(col("query_id"), col("cand_id"),
        (Portable.dotQ(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cosine"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("cand_id"))))
      .filter(col("rn") <= beamWidth).drop("rn")
    for (_ <- 1 to insertRounds) {
      val expand = bb.select(col("query_id"), col("cand_id"))
        .join(hop, "cand_id")
        .select(col("query_id"), col("next_id").as("cand_id"))
      val pool = bb.select("query_id", "cand_id").union(expand).distinct()
      val scored = pool
        .join(qn.select(col("vec_id").as("cand_id"), col("q").as("qb"),
          col("nsq").as("nb")), "cand_id")
        .join(dq, "query_id")
        .select(col("query_id"), col("cand_id"),
          (Portable.dotQ(col("qa"), col("qb")).cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
            .as("cosine"))
      bb = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy("query_id").orderBy(desc("cosine"), col("cand_id"))))
        .filter(col("rn") <= beamWidth).drop("rn")
        .cutRound
    }
    bb
  }

  def nnDescentInsert(spark: SparkSession, dir: String, k: Int = topK): DataFrame =
    insertBeams(spark, dir)
      .select(col("query_id"), col("cand_id"), col("cosine"),
        row_number().over(
          Window.partitionBy("query_id").orderBy(desc("cosine"), col("cand_id")))
          .cast("long").as("rank"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")

  /** Measurement-panel size for the insert recall gate: the exact side
    * is a brute-force scan per panel query, so the panel must be FIXED
    * — a whole-delta exact side is delta×base ≈ corpus² and was
    * measured superlinear at 64× (227 s) before this bound. 64 queries
    * keeps the gate statistically meaningful and the exact side one
    * bounded corpus scan, the same posture as the 8-query panel every
    * other recall gate uses. */
  private val insertPanel = 64

  /** Recall@k of the insert path vs the exact panel×base brute force —
    * per panel query (the [[insertPanel]] smallest delta ids), like
    * every other ANN gate; the production path ([[nnDescentInsert]])
    * still runs the WHOLE delta. */
  def nnDescentInsertRecall(spark: SparkSession, dir: String, k: Int = topK): DataFrame = {
    val qn = quantizedPlan(spark, dir)
    val dq = qn.filter(splitH(col("vec_id")) >= 90)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nsq").as("na"))
      .orderBy("query_id").limit(insertPanel)
    val base = qn.filter(splitH(col("vec_id")) < 90)
      .select(col("vec_id").as("cand_id"), col("q").as("qb"), col("nsq").as("nb"))
    val exact = base.crossJoin(broadcast(dq))
      .withColumn("cosine",
        Portable.dotQ(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .select(col("query_id"), col("cand_id"),
        row_number().over(
          Window.partitionBy("query_id").orderBy(desc("cosine"), col("cand_id")))
          .as("rank"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id")
    val approx = nnDescentInsert(spark, dir, k)
      .select(col("query_id"), col("cand_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("query_id", "cand_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / col("n_exact").cast("double"))
      .orderBy("query_id")
  }

  // --------------------------------------------------------------- oracle

  /** Unrolled build: CTE chain ending in `g$buildRounds` (src, dst,
    * cosine) and `ub` (undirected). MATERIALIZED everywhere — the
    * rounds reference each other several times and DuckDB would
    * otherwise re-inline the whole prefix per reference. */
  private def buildSql: String = {
    def score(pairs: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT p.src, p.dst,
         |         CAST(CAST(list_sum(list_transform(generate_series(1, $dims), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS DOUBLE)
         |           / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
         |  FROM $pairs p JOIN qn a ON a.vec_id = p.src JOIN qn b ON b.vec_id = p.dst)""".stripMargin
    def keep(scored: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT src, dst, cosine FROM (
         |    SELECT src, dst, cosine,
         |           row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
         |    FROM $scored) WHERE rn <= $degree)""".stripMargin
    val init =
      s"""nn AS MATERIALIZED (SELECT count(*) AS n FROM qn),
         |init AS MATERIALIZED (
         |  SELECT DISTINCT i.vec_id AS src,
         |         (i.vec_id + 1 + (('0x' || substr(md5('nnd_' || i.vec_id || '_' || j.j), 1, 15))::BIGINT % (nn.n - 1))) % nn.n AS dst
         |  FROM qn i
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${degree - 1})) AS j) j
         |  CROSS JOIN nn),
         |${score("init", "s0")},
         |${keep("s0", "g0")}""".stripMargin
    val rounds = (1 to buildRounds).map { r =>
      s"""rv$r AS MATERIALIZED (
         |  SELECT rsrc AS src, rdst AS dst FROM (
         |    SELECT g.dst AS rsrc, g.src AS rdst,
         |           row_number() OVER (PARTITION BY g.dst ORDER BY g.src) AS rn
         |    FROM g${r - 1} g) WHERE rn <= $degree),
         |ua$r AS MATERIALIZED (
         |  SELECT src, dst FROM g${r - 1} UNION SELECT src, dst FROM rv$r),
         |u$r AS MATERIALIZED (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY
         |      ('0x' || substr(md5(src || '_' || dst), 1, 15))::BIGINT, dst) AS rn
         |    FROM ua$r) WHERE rn <= $degree),
         |c$r AS MATERIALIZED (
         |  SELECT DISTINCT a.src, b.dst FROM u$r a JOIN u$r b ON a.dst = b.src
         |  WHERE a.src <> b.dst),
         |p$r AS MATERIALIZED (
         |  SELECT src, dst FROM c$r UNION SELECT src, dst FROM g${r - 1}),
         |${score(s"p$r", s"s$r")},
         |${keep(s"s$r", s"g$r")}""".stripMargin
    }.mkString(",\n")
    s"""$init,
       |$rounds,
       |ub AS MATERIALIZED (
       |  SELECT src, dst FROM g$buildRounds
       |  UNION SELECT dst AS src, src AS dst FROM g$buildRounds)""".stripMargin
  }

  /** Unrolled beam search with a `beam` budget column; ends in
    * `cb$beamRounds` (beam, query_id, cand_id, cosine). */
  private def beamSql(widths: Seq[Long]): String = {
    val scoreBeam = (pairs: String, out: String) =>
      s"""$out AS MATERIALIZED (
         |  SELECT p.beam, p.query_id, p.cand_id,
         |         CAST(CAST(list_sum(list_transform(generate_series(1, $dims), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS DOUBLE)
         |           / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
         |  FROM $pairs p JOIN qn a ON a.vec_id = p.query_id JOIN qn b ON b.vec_id = p.cand_id)""".stripMargin
    val b0 =
      s"""bud AS MATERIALIZED (SELECT CAST(unnest([${widths.mkString(", ")}]) AS BIGINT) AS beam),
         |cb0 AS MATERIALIZED (
         |  SELECT b.beam, t.query_id, t.cand_id, t.cosine
         |  FROM (SELECT src AS query_id, dst AS cand_id, cosine,
         |               row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
         |        FROM g$buildRounds WHERE src < 8) t
         |  JOIN bud b ON t.rn <= b.beam)""".stripMargin
    val rounds = (1 to beamRounds).map { tt =>
      s"""ce$tt AS MATERIALIZED (
         |  SELECT beam, query_id, cand_id FROM (
         |    SELECT DISTINCT p.beam, p.query_id, u.dst AS cand_id
         |    FROM cb${tt - 1} p JOIN ub u ON u.src = p.cand_id
         |    WHERE u.dst <> p.query_id)
         |  UNION SELECT beam, query_id, cand_id FROM cb${tt - 1}),
         |${scoreBeam(s"ce$tt", s"cs$tt")},
         |cb$tt AS MATERIALIZED (
         |  SELECT beam, query_id, cand_id, cosine FROM (
         |    SELECT beam, query_id, cand_id, cosine,
         |           row_number() OVER (PARTITION BY beam, query_id ORDER BY cosine DESC, cand_id) AS rn
         |    FROM cs$tt) WHERE rn <= beam)""".stripMargin
    }.mkString(",\n")
    s"$b0,\n$rounds"
  }

  /** Unrolled insert search over the base-projected graph; ends in
    * `ib$insertRounds` (query_id, cand_id, cosine). */
  private def insertSql: String = {
    def sp(c: String) = s"(('0x' || substr(md5('split_' || $c), 1, 15))::BIGINT % 100)"
    val scoreIns = (pairs: String, out: String) =>
      s"""$out AS MATERIALIZED (
         |  SELECT p.query_id, p.cand_id,
         |         CAST(CAST(list_sum(list_transform(generate_series(1, $dims), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS DOUBLE)
         |           / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
         |  FROM $pairs p JOIN qn a ON a.vec_id = p.query_id JOIN qn b ON b.vec_id = p.cand_id)""".stripMargin
    val head =
      s"""bg AS MATERIALIZED (
         |  SELECT src, dst FROM g$buildRounds
         |  WHERE ${sp("src")} < 90 AND ${sp("dst")} < 90),
         |ubi AS MATERIALIZED (
         |  SELECT src, dst FROM bg UNION SELECT dst AS src, src AS dst FROM bg),
         |dq AS MATERIALIZED (
         |  SELECT vec_id AS query_id, qv, nsq FROM qn WHERE ${sp("vec_id")} >= 90),
         |ent AS MATERIALIZED (
         |  SELECT vec_id, qv, nsq FROM qn WHERE ${sp("vec_id")} < 90
         |  ORDER BY vec_id LIMIT $degree),
         |ib0 AS MATERIALIZED (
         |  SELECT query_id, cand_id, cosine FROM (
         |    SELECT d.query_id, e.vec_id AS cand_id,
         |           CAST(CAST(list_sum(list_transform(generate_series(1, $dims), i -> d.qv[i] * e.qv[i])) AS BIGINT) AS DOUBLE)
         |             / (sqrt(CAST(d.nsq AS DOUBLE)) * sqrt(CAST(e.nsq AS DOUBLE))) AS cosine,
         |           row_number() OVER (PARTITION BY d.query_id ORDER BY
         |             CAST(CAST(list_sum(list_transform(generate_series(1, $dims), i -> d.qv[i] * e.qv[i])) AS BIGINT) AS DOUBLE)
         |               / (sqrt(CAST(d.nsq AS DOUBLE)) * sqrt(CAST(e.nsq AS DOUBLE))) DESC, e.vec_id) AS rn
         |    FROM dq d CROSS JOIN ent e) WHERE rn <= $beamWidth)""".stripMargin
    val rounds = (1 to insertRounds).map { tt =>
      s"""ie$tt AS MATERIALIZED (
         |  SELECT query_id, cand_id FROM (
         |    SELECT DISTINCT p.query_id, u.dst AS cand_id
         |    FROM ib${tt - 1} p JOIN ubi u ON u.src = p.cand_id)
         |  UNION SELECT query_id, cand_id FROM ib${tt - 1}),
         |${scoreIns(s"ie$tt", s"is$tt")},
         |ib$tt AS MATERIALIZED (
         |  SELECT query_id, cand_id, cosine FROM (
         |    SELECT query_id, cand_id, cosine,
         |           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
         |    FROM is$tt) WHERE rn <= $beamWidth)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$rounds"
  }

  def nnDescentInsertSql(k: Int = topK): String =
    s"""WITH ${Similarity.quantizedSql},
       |$buildSql,
       |$insertSql
       |SELECT query_id, cand_id, cosine, rank FROM (
       |  SELECT query_id, cand_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
       |  FROM ib$insertRounds) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  def nnDescentInsertRecallSql(k: Int = topK): String = {
    def sp(c: String) = s"(('0x' || substr(md5('split_' || $c), 1, 15))::BIGINT % 100)"
    s"""WITH ${Similarity.quantizedSql},
       |$buildSql,
       |$insertSql,
       |approx AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
       |    FROM ib$insertRounds) WHERE rank <= $k),
       |pnl AS (
       |  SELECT vec_id FROM qn WHERE ${sp("vec_id")} >= 90
       |  ORDER BY vec_id LIMIT $insertPanel),
       |exact AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |             CAST(${Similarity.dotSql} AS DOUBLE) / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) DESC,
       |             b.vec_id) AS rank
       |    FROM qn a JOIN qn b
       |      ON a.vec_id IN (SELECT vec_id FROM pnl) AND ${sp("b.vec_id")} < 90)
       |  WHERE rank <= $k)
       |SELECT e.query_id, count(*) AS n_exact,
       |       CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS recall
       |FROM exact e LEFT JOIN approx a
       |  ON e.query_id = a.query_id AND e.cand_id = a.cand_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin
  }

  def knnGraphSql: String =
    s"""WITH ${Similarity.quantizedSql},
       |$buildSql
       |SELECT src, dst, cosine FROM g$buildRounds ORDER BY src, dst""".stripMargin

  def nnDescentTopKSql(k: Int = topK): String =
    s"""WITH ${Similarity.quantizedSql},
       |$buildSql,
       |${beamSql(Seq(beamWidth.toLong))}
       |SELECT query_id, cand_id, cosine, rank FROM (
       |  SELECT query_id, cand_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
       |  FROM cb$beamRounds) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  def nnDescentRecallSql(k: Int = topK): String =
    s"""WITH exact AS (SELECT query_id, cand_id FROM (${Similarity.cosineTopKSql(k)})),
       |approx AS (SELECT query_id, cand_id FROM (${nnDescentTopKSql(k)}))
       |SELECT e.query_id, count(*) AS n_exact,
       |       CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS recall
       |FROM exact e LEFT JOIN approx a
       |  ON e.query_id = a.query_id AND e.cand_id = a.cand_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin

  def beamCurveSql(k: Int = topK): String =
    s"""WITH ${Similarity.quantizedSql},
       |$buildSql,
       |${beamSql(curveBeams)},
       |ctop AS MATERIALIZED (
       |  SELECT beam, query_id, cand_id FROM (
       |    SELECT beam, query_id, cand_id,
       |           row_number() OVER (PARTITION BY beam, query_id ORDER BY cosine DESC, cand_id) AS rank
       |    FROM cb$beamRounds) WHERE rank <= $k),
       |exact AS MATERIALIZED (
       |  SELECT query_id, cand_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |             CAST(${Similarity.dotSql} AS DOUBLE) / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) DESC,
       |             b.vec_id) AS rank
       |    FROM qn a JOIN qn b ON a.vec_id <> b.vec_id
       |    WHERE a.vec_id < 8) WHERE rank <= $k)
       |SELECT b.beam, count(*) AS n_exact,
       |       CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS recall
       |FROM bud b CROSS JOIN exact e
       |LEFT JOIN ctop t ON t.beam = b.beam AND t.query_id = e.query_id
       |  AND t.cand_id = e.cand_id
       |GROUP BY b.beam ORDER BY b.beam""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_nndescent_graph" -> ((s, d) => knnGraph(s, d)),
    "sim_nndescent_topk" -> ((s, d) => nnDescentTopK(s, d)),
    "sim_nndescent_recall" -> ((s, d) => nnDescentRecall(s, d)),
    "sim_nndescent_beam_curve" -> ((s, d) => beamCurve(s, d)),
    "sim_nndescent_insert" -> ((s, d) => nnDescentInsert(s, d)),
    "sim_nndescent_insert_recall" -> ((s, d) => nnDescentInsertRecall(s, d)))

  val oracles: Map[String, String] = Map(
    "sim_nndescent_graph" -> knnGraphSql,
    "sim_nndescent_topk" -> nnDescentTopKSql(),
    "sim_nndescent_recall" -> nnDescentRecallSql(),
    "sim_nndescent_beam_curve" -> beamCurveSql(),
    "sim_nndescent_insert" -> nnDescentInsertSql(),
    "sim_nndescent_insert_recall" -> nnDescentInsertRecallSql())
}
