package graft.aria

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Workload
import graft.model.AriaConfig

/** Harness-facing queries over the Aria transaction engine. The epoch
  * loop itself is not SQL-expressible (iterative, state-carrying) — the
  * drain queries are rows-only for the driver, with deep correctness
  * covered by the serial-replay simulator in AriaSpec. The one-epoch
  * Execute→Reserve→Analyze→Decide slice IS SQL-expressible: `Verify`
  * persists the seeded epoch-0 workload to parquet and
  * `epoch0VerdictsSql` recomputes the verdicts in DuckDB over those
  * files (full hash-match oracle).
  *
  * Config is intentionally independent of sfDir (the engine runs on its
  * own deterministic generated workload — matching the reference, which
  * generates its data in memory, db.h:42-53).
  */
object AriaQueries {

  // Harness-sized drain: 100 txns over 3000 hot keys drains in ~7
  // epochs — still several rounds of real aborts/retries, at half the
  // per-round latency of the old 150/2000 config (14 epochs of fixed
  // scheduler overhead). Full-size runs live in AriaMain and the specs.
  private[graft] val cfg = AriaConfig(
    nTxns = 100, maxOps = 30, writePct = 40,
    keysMax = 3000, tableKeys = 20000, seed = 42L, maxEpochs = 32)

  // One drain per (session, mode): the three harness queries all consume
  // the same deterministic run, so recomputing the epoch loop per query
  // would only re-measure scheduler overhead. Weak keys — a dropped
  // SparkSession must not pin its cached run (long-lived JVMs).
  private val cache =
    new java.util.WeakHashMap[SparkSession, Map[Boolean, Aria.RunResult]]
  private def cachedRun(spark: SparkSession, reorder: Boolean): Aria.RunResult =
    cache.synchronized {
      val perSession = cache.getOrDefault(spark, Map.empty)
      perSession.get(reorder) match {
        case Some(r) => r
        case None =>
          val r = Aria.run(spark, cfg.copy(reorder = reorder))
          cache.put(spark, perSession + (reorder -> r))
          r
      }
    }

  /** Per-epoch commit/abort accounting of the full drain-to-empty run —
    * the reference's observable behavior (printf traces of db.test()). */
  def epochStats(spark: SparkSession, dir: String): DataFrame =
    spark.createDataFrame(cachedRun(spark, reorder = false).stats).orderBy("epoch")

  /** Reorder-mode comparison: both commit rules on the same batch —
    * reorder must commit a superset per epoch 0 (Aria's optimization). */
  def reorderComparison(spark: SparkSession, dir: String): DataFrame = {
    val base = cachedRun(spark, reorder = false).stats
    val reorder = cachedRun(spark, reorder = true).stats
    val rows = Seq(
      ("no_reorder", base.length.toLong, base.map(_.committed).sum, base.head.committed),
      ("reorder", reorder.length.toLong, reorder.map(_.committed).sum, reorder.head.committed))
    spark.createDataFrame(rows)
      .toDF("mode", "epochs_to_drain", "total_committed", "epoch0_committed")
      .orderBy("mode")
  }

  /** Final table state after the drain, summarized (checksum + count) —
    * the serializability-relevant output. */
  def finalTableSummary(spark: SparkSession, dir: String): DataFrame = {
    val run = cachedRun(spark, reorder = false)
    run.table.agg(
      count(lit(1)).as("n_rows"),
      expr("bit_xor(xxhash64(key, f0, f4, f9))").as("table_checksum"))
  }

  /** One epoch's verdicts (hazard flags + decision) on the epoch-0 batch
    * — the Execute→Reserve→Analyze→Decide slice as a single DataFrame. */
  def epoch0Verdicts(spark: SparkSession, dir: String): DataFrame = {
    val table = Workload.kvTable(spark, cfg.tableKeys, cfg.seed)
    val ops0 = Workload.txnOps(spark, cfg.nTxns, cfg.maxOps, cfg.writePct,
      cfg.keysMax, cfg.seed)
    val ops = ops0.join(table.select("key"), Seq("key"), "leftsemi")
      .select("tid", "epoch", "opIdx", "key", "isUpdate")
    Aria.decide(Aria.analyze(ops, Aria.reserve(ops)), cfg.reorder)
      .orderBy("tid")
  }

  /** Persist the seeded epoch-0 workload (table keys + exploded ops) so
    * DuckDB can recompute the verdicts independently. Called by Verify
    * before it dumps oracle_sql.json. */
  def persistEpoch0Inputs(spark: SparkSession, outDir: String): Unit = {
    Workload.kvTable(spark, cfg.tableKeys, cfg.seed).select("key")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/aria_epoch0_keys")
    Workload.txnOps(spark, cfg.nTxns, cfg.maxOps, cfg.writePct,
        cfg.keysMax, cfg.seed)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/aria_epoch0_ops")
  }

  /** DuckDB oracle for `epoch0Verdicts` over the persisted workload —
    * the reference's hazard rules (TrancM_func.cuh:126-250): RAW/WAR/WAW
    * against strictly-smaller Tids, zero = unreserved, no-reorder commit
    * rule abort iff raw ∨ waw. `__ARIA_DIR__` is substituted by Verify
    * with the absolute output directory. */
  val epoch0VerdictsSql: String =
    """WITH ops AS (
      |  SELECT tid, key, isUpdate
      |  FROM read_parquet('__ARIA_DIR__/aria_epoch0_ops/*.parquet')
      |  WHERE key IN (SELECT key FROM read_parquet('__ARIA_DIR__/aria_epoch0_keys/*.parquet'))
      |), res AS (
      |  SELECT key, min(tid) AS rts,
      |         coalesce(min(CASE WHEN isUpdate THEN tid END), 0) AS wts
      |  FROM ops GROUP BY key
      |), flags AS (
      |  SELECT tid,
      |         bool_or(wts <> 0 AND wts < tid) AS raw,
      |         bool_or(isUpdate AND rts < tid) AS war,
      |         bool_or(isUpdate AND wts <> 0 AND wts < tid) AS waw
      |  FROM ops JOIN res USING (key)
      |  GROUP BY tid
      |)
      |SELECT tid, raw, war, waw, (raw OR waw) AS abort
      |FROM flags ORDER BY tid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "aria_epoch_stats" -> epochStats,
    "aria_reorder_comparison" -> reorderComparison,
    "aria_final_table" -> finalTableSummary,
    "aria_epoch0_verdicts" -> epoch0Verdicts)

  val oracles: Map[String, String] = Map(
    "aria_epoch0_verdicts" -> epoch0VerdictsSql)
}
