package graft.aria

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Workload
import graft.model.{AriaConfig, EpochStats}

/** Aria-style deterministic epoch-batch transaction processing as Spark
  * dataflow (SURVEY.md §2.2, T2–T11).
  *
  * Reference pipeline (/root/reference/src/database/ycsb/db.h:111-125):
  *   Execute → Commit(analyze) → Install → Collect, with device-wide
  * barriers between phases. Each phase is a pure set-oriented transform
  * over immutable snapshots, so the natural Spark expression is:
  *
  *   Execute/reserve  = ops ⋈ table (snapshot) + groupBy(key).agg(min(tid))
  *   Commit(analyze)  = ops ⋈ reservations + per-txn max(hazard flags)
  *   Install          = decision `when()` + left-join merge write-back
  *   Collect          = filter aborted + row_number renumber
  *
  * The CAS-min races of the reference (metadatahelper.cuh:36-90) are a
  * commutative min-monoid — exactly Spark's partial+final hash aggregation,
  * so reservations shuffle once on `key` with map-side combine. At cluster
  * scale each phase is a single shuffle stage; the phase barriers of the
  * reference are Spark's stage boundaries for free.
  *
  * Semantics preserved (SURVEY.md §2.5): min-Tid wins reservations; hazards
  * only against strictly smaller Tids; Tid 0 = unreserved sentinel; every op
  * is a read-set entry, update ops also write-set entries; ops on absent
  * keys are skipped (primary path, TrancM_func.cuh:32-34); aborted txns
  * retry with their original ops, compacted and renumbered 1..m; commit
  * rules: no-reorder → abort iff raw∨waw (TrancM_func.cuh:209), reorder →
  * abort iff waw ∨ (raw∧war) (TrancM_func.cuh:183-187).
  */
object Aria {

  /** T5 Reserve: per-key min-Tid read/write reservations for one epoch.
    * 0 = unreserved (the reference's zero sentinel). Input ops MUST already
    * be restricted to keys present in the table.
    *
    * `keyCols` instantiates the reference's 2-D `table_vec` ambition
    * (database.h:20 — a vector of per-table hash maps it declares but
    * never exercises): multi-table txns reserve per (tbl, key), which
    * relationally is just a wider grouping key — same shuffle, same
    * min-monoid, no second code path. Default = the reference's
    * single-table behavior.
    */
  def reserve(ops: DataFrame, keyCols: Seq[String] = Seq("key")): DataFrame =
    ops.groupBy(keyCols.map(col): _*).agg(
      min("tid").as("rts"),
      coalesce(min(when(col("isUpdate"), col("tid"))), lit(0)).as("wts"))

  /** T6 Commit: per-txn hazard analysis against the reservation table.
    * RAW: any op (read set = all ops) sees a write reservation from a
    * strictly smaller Tid. WAR: any write op sees a read reservation from a
    * strictly smaller Tid. WAW: any write op sees a write reservation from
    * a strictly smaller Tid. (TrancM_func.cuh:126-164.)
    */
  def analyze(ops: DataFrame, reservations: DataFrame,
              keyCols: Seq[String] = Seq("key")): DataFrame = {
    val j = ops.join(reservations, keyCols)
    j.groupBy("tid").agg(
      max(col("wts") =!= 0 && col("wts") < col("tid")).as("raw"),
      max(col("isUpdate") && col("rts") < col("tid")).as("war"),
      max(col("isUpdate") && col("wts") =!= 0 && col("wts") < col("tid")).as("waw"))
  }

  /** T7 decision: abort column per txn.
    * no-reorder: abort iff raw ∨ waw (WAR computed but ignored, §2.6);
    * reorder (Aria's deterministic reordering): abort iff waw ∨ (raw ∧ war).
    */
  def decide(verdicts: DataFrame, reorder: Boolean): DataFrame = {
    val abortCol =
      if (reorder) col("waw") || (col("raw") && col("war"))
      else col("raw") || col("waw")
    verdicts.withColumn("abort", abortCol)
  }

  /** T7 Install: merge committed writes back into the table snapshot.
    *
    * Within a txn, the last op on a key wins (ops applied in op order,
    * TrancM_func.cuh:213-224 ≙ T10's per-key op chains). Across txns, at
    * most one committed writer per key exists — any non-min-Tid writer
    * carries WAW and aborted — so the per-key winner is unique; we assert
    * this in tests rather than tie-breaking (SURVEY.md §7.4.4).
    *
    * The merge is a left join table⋈winners on key + coalesce per field:
    * one shuffle of the (small) winner set against the table; with AQE the
    * winner side broadcasts when small.
    */
  def install(table: DataFrame, ops: DataFrame, decisions: DataFrame, seed: Long,
              keyCols: Seq[String] = Seq("key")): DataFrame = {
    val committedWrites = ops
      .join(decisions.filter(!col("abort")).select("tid"), Seq("tid"))
      .filter(col("isUpdate"))
    // Last op per key among committed writers. The committed tid is unique
    // per key (non-min writers abort on WAW), so ordering by opIdx alone is
    // total; max(struct) is a commutative agg → partial+final aggregation,
    // one shuffle, no single-partition window.
    val winners = committedWrites
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col("opIdx"), col("tid"), col("epoch"))).as("w"))
      .select(keyCols.map(col) ++ Seq(col("w.tid").as("tid"),
        col("w.epoch").as("epoch"), col("w.opIdx").as("opIdx")): _*)
    mergeWinners(table, winners, seed, keyCols)
  }

  /** Shared write-back tail of [[install]] and [[fallbackApply]]: value
    * each per-key winning (epoch, tid, opIdx) op and left-join-merge it
    * into the table snapshot. Writes to absent keys drop here (the left
    * join keeps only table keys), matching the reference's skip of ops
    * on missing keys. */
  private def mergeWinners(table: DataFrame, winners: DataFrame, seed: Long,
                           keyCols: Seq[String]): DataFrame = {
    val valued = (0 until 10).foldLeft(winners) { (df, i) =>
      df.withColumn(s"nf$i", Workload.writePayload(seed, i))
    }.select(keyCols.map(col) ++ (0 until 10).map(i => col(s"nf$i")): _*)

    table.join(valued, keyCols, "left").select(
      keyCols.map(col) ++ (0 until 10).map(i =>
        coalesce(col(s"nf$i"), col(s"f$i")).as(s"f$i")): _*)
  }

  /** Aria-paper fallback: apply a residual batch as one deterministic
    * serial pass in Tid order — the relational image of "process the
    * deferred transactions with deterministic (ordered-lock) execution,
    * which commits every one of them". Serial execution txn-by-txn in
    * Tid order, ops in op order, means the per-key winning write is
    * simply max(tid, opIdx) over the batch's update ops — one
    * partial+final agg shuffle plus the same merge join as [[install]];
    * no per-txn iteration, no window, nothing batch-length-dependent.
    * (Writes here are pure functions of (seed, epoch, tid, opIdx), so
    * last-writer-wins IS the serial outcome; a read-dependent payload
    * would need T10's per-key op-chain machinery instead.) */
  def fallbackApply(table: DataFrame, ops: DataFrame, seed: Long,
                    keyCols: Seq[String] = Seq("key")): DataFrame = {
    val winners = ops.filter(col("isUpdate"))
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col("tid"), col("opIdx"), col("epoch"))).as("w"))
      .select(keyCols.map(col) ++ Seq(col("w.tid").as("tid"),
        col("w.epoch").as("epoch"), col("w.opIdx").as("opIdx")): _*)
    mergeWinners(table, winners, seed, keyCols)
  }

  /** T8 Collect: keep aborted txns' ops, renumber Tids 1..m preserving
    * original relative order (TransctionManager.cuh:176-184), bump epoch.
    *
    * The aborted-Tid set is already on the driver (the loop needs the
    * count anyway, and it is bounded by the batch size — 150 in the
    * reference, never the table size), so renumbering is a literal-map
    * lookup folded into the projection — no join, no broadcast exchange,
    * no global window: one map-side stage per epoch on the latency-bound
    * drain chain.
    */
  def collect(ops: DataFrame, abortedTids: Array[Int],
              keyCols: Seq[String] = Seq("key")): DataFrame = {
    val tail = keyCols.map(col) :+ col("isUpdate")
    val shape = ops.select(col("tid") +: (col("epoch") + 1).as("epoch") +:
      col("opIdx") +: tail: _*)
    if (abortedTids.isEmpty) shape.filter(lit(false))
    else {
      val renumber = map(abortedTids.sorted.zipWithIndex.flatMap {
        case (t, i) => Seq(lit(t), lit(i + 1)) }: _*)
      ops.filter(col("tid").isInCollection(abortedTids))
        .select(element_at(renumber, col("tid")).as("tid") +:
          (col("epoch") + 1).as("epoch") +: col("opIdx") +: tail: _*)
    }
  }

  final case class EpochResult(table: DataFrame, retryOps: DataFrame,
                               stats: EpochStats, abortedTids: Array[Int])

  /** T11: one epoch — Execute(restrict to present keys) → Reserve → Analyze
    * → Decide → Install → Collect. Returns the new table snapshot and the
    * renumbered retry batch.
    *
    * `nTxnsInBatch` is the batch size INCLUDING txns whose exploded op set
    * is empty (zero generated ops, or every op on an absent key): those
    * never enter `ops`, carry no hazards, and commit vacuously — exactly
    * the reference, where an op-less thread runs the phases with empty
    * read/write sets and installs nothing.
    */
  def runEpoch(table: DataFrame, opsIn: DataFrame, epoch: Int,
               nTxnsInBatch: Long, cfg: AriaConfig,
               keyCols: Seq[String] = Seq("key")): EpochResult = {
    // Execute: batch point lookups ≡ equi-join; ops on absent keys are
    // dropped entirely (never enter read/write sets, TrancM_func.cuh:32-34).
    // When the generator's keyspace is contained in the table keyspace
    // (keys 1..keysMax ⊆ 1..tableKeys, both dense), the presence filter
    // is statically a no-op — skip the per-epoch semi-join shuffle.
    val shape = Seq("tid", "epoch", "opIdx") ++ keyCols :+ "isUpdate"
    val ops =
      if (cfg.keysMax <= cfg.tableKeys)
        opsIn.select(shape.head, shape.tail: _*)
      else opsIn.join(table.select(keyCols.map(col): _*), keyCols, "leftsemi")
        .select(shape.head, shape.tail: _*)

    val res = reserve(ops, keyCols)
    val verdicts = decide(analyze(ops, res, keyCols), cfg.reorder)
    val decisions = verdicts.select("tid", "abort")

    // the only driver action of the epoch: the loop needs the abort set
    // anyway (loop condition + Tid renumbering); bounded by batch size.
    val abortedTids = decisions.filter(col("abort")).select("tid")
      .collect().map(_.getInt(0)).sorted

    val newTable = install(table, ops, decisions, cfg.seed, keyCols)
    val retry = collect(ops, abortedTids, keyCols)
    val nAborted = abortedTids.length.toLong
    EpochResult(newTable, retry,
      EpochStats(epoch, nTxnsInBatch, nTxnsInBatch - nAborted, nAborted), abortedTids)
  }

  final case class RunResult(table: DataFrame, stats: Seq[EpochStats])

  /** The full drain-to-empty loop (db.h:104-109): run epochs until no txns
    * remain. `localCheckpoint` per epoch truncates lineage so plans don't
    * snowball across iterations (SURVEY.md §7.4.1) — on a cluster this is
    * the standard iterative-algorithm pattern (cf. GraphX/ALS).
    */
  def run(spark: SparkSession, cfg: AriaConfig): RunResult = {
    // Size the engine's shuffles to its (small-batch) workload: the
    // reference batch is ≤200 txns over ≤200k keys — dozens of shuffle
    // partitions only add scheduling latency per epoch, and AQE's
    // per-stage re-optimization is pure overhead at this size. Two
    // tasks per stage covers a ≤6k-op batch; the drain is a latency-
    // bound chain of ~7 tiny jobs, so every task saved is wall time.
    // Restored after the loop; results are partitioning-independent
    // (asserted in AriaSpec), so this is a latency knob, not a
    // semantics knob. On a real cluster with large batches, keep AQE
    // on and partitions high.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // ... but the clamp must SCALE WITH THE TABLE: at reference size two
    // tasks cover the batch, while a decade-scale table split two ways
    // puts tens of millions of rows in one shuffle task and thrashes the
    // heap (the 10,000× drain attempt died on spill space before this
    // sized up). One task per ~10M table keys keeps the epoch tiny for
    // the reference config and data-proportional at scale.
    val scaledParts = math.max(2L,
      math.min(prevParts.toLong, cfg.tableKeys.toLong / KeysPerShuffleTask + 1L))
    spark.conf.set("spark.sql.shuffle.partitions", scaledParts.toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try runLoop(spark, cfg)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** Table keys one shuffle task can hold without thrashing the heap —
    * the partition-scaling constant for [[run]]'s clamp (sized from the
    * 10,000×-drain spill failure: tens of millions of rows in one task
    * died; one task per ~10M keys recovered it). */
  private val KeysPerShuffleTask = 10000000L

  /** Tables whose per-generation checkpoint blocks are big enough that
    * leaking one set per epoch matters — derived from (half of)
    * [[KeysPerShuffleTask]]: well before a table needs more shuffle
    * tasks, its generations already need eager reclamation. Configs in
    * between (≥ this, < KeysPerShuffleTask) get eager hygiene while
    * still fitting one task — that ordering is deliberate: hygiene must
    * engage BEFORE partition scaling, never after. */
  private val EagerHygieneKeys = KeysPerShuffleTask / 2

  /** Decade-scale configs take the eager cascade-and-free path below;
    * the reference-size drain keeps its measured lazy-checkpoint
    * latency profile (the block sets it leaks are kilobytes). */
  private def eagerHygiene(cfg: AriaConfig): Boolean =
    cfg.forceEagerHygiene || cfg.tableKeys >= EagerHygieneKeys

  private def runLoop(spark: SparkSession, cfg: AriaConfig): RunResult = {
    // lazy localCheckpoints: lineage is truncated identically, but the
    // materialization folds into the next epoch's first job instead of
    // costing a dedicated job per checkpoint (2 fewer jobs/epoch).
    val table = Workload.kvTable(spark, cfg.tableKeys, cfg.seed)
      .localCheckpoint(eager = eagerHygiene(cfg))
    val ops = Workload.txnOps(spark, cfg.nTxns, cfg.maxOps, cfg.writePct,
      cfg.keysMax, cfg.seed).localCheckpoint(eager = eagerHygiene(cfg))
    runFrom(spark, cfg, table, ops, startEpoch = 0, remaining0 = cfg.nTxns.toLong)
  }

  /** Resume (or start) the drain from EXPLICIT state — the durability
    * boundary a production drain needs: every epoch's (table, retry
    * batch) pair is a complete, self-contained snapshot of the machine
    * (epochs are deterministic functions of it), so persisting the two
    * frames to parquet at any epoch boundary and calling this on the
    * read-back resumes the drain to a bit-identical final table even in
    * a fresh session after driver loss. Spark's own resilience covers
    * task/executor failure WITHIN an epoch; this covers everything
    * above it. [[run]] is exactly this from the generated epoch-0
    * state. `remaining0` = txns in `ops0`'s batch (its distinct-tid
    * count; passed in because the caller always knows it and the loop
    * must not pay a count job to rediscover it). */
  def runFrom(spark: SparkSession, cfg: AriaConfig, table0: DataFrame,
              ops0: DataFrame, startEpoch: Int, remaining0: Long): RunResult = {
    var table = table0
    var ops = ops0
    // Frames the loop checkpointed ITSELF are provably droppable
    // checkpoint roots; the caller's generation-0 frames may be anything
    // (runLoop hands in checkpoints, a resume hands in parquet reads
    // with no blocks to free) — probe those instead of asserting.
    var loopOwned = false
    val stats = Seq.newBuilder[EpochStats]
    var epoch = startEpoch
    var remaining = remaining0
    while (remaining > 0 && epoch < cfg.maxEpochs) {
      val r = runEpoch(table, ops, epoch, remaining, cfg)
      if (eagerHygiene(cfg)) {
        // decade-scale tables: cascade EAGERLY and free the superseded
        // generation at once. Lazy checkpoints defer every install to
        // whatever job finally reads the table — the whole epoch chain
        // then materializes inside one job with every generation's
        // blocks pinned (the 10,000×-batch attempt accumulated 78 GB of
        // spill and died). Eager per-epoch materialization bounds live
        // storage at two generations; the two extra jobs per epoch are
        // noise against a decade-scale epoch. Dropping is safe ONLY
        // because the new checkpoint has just materialized — a local
        // checkpoint is non-reliable, so blocks must never be dropped
        // while a lazy plan could still read them.
        val nt = r.table.localCheckpoint(eager = true)
        val no = r.retryOps.localCheckpoint(eager = true)
        Seq(table, ops).foreach { f =>
          if (loopOwned || GraftBridge.isCheckpointRoot(f))
            GraftBridge.dropCheckpointBlocks(f)
        }
        table = nt
        ops = no
      } else {
        // reference-size batches: lazy checkpoints fold materialization
        // into the next epoch's first job (2 fewer jobs/epoch, measured)
        // and the handful of tiny block sets is not worth reclaiming.
        table = r.table.localCheckpoint(false)
        ops = r.retryOps.localCheckpoint(false)
      }
      loopOwned = true
      stats += r.stats
      remaining = r.stats.aborted
      epoch += 1
      // Contention-collapse fallback (cfg.fallbackCommitRate): min-Tid
      // starvation at batch≈keyspace makes each further epoch commit a
      // near-constant handful of txns — O(batch) epochs to drain (the
      // reference avoids the regime only by its 150/20k operating
      // point). When an epoch's commit rate drops below the threshold,
      // apply the whole residual as ONE deterministic serial pass. The
      // retry batch already carries the next epoch number and renumbered
      // Tids, so the fallback epoch's stats row and payload keys line up
      // with what [[collect]] produced.
      if (remaining > 0 && cfg.fallbackCommitRate > 0 &&
          r.stats.committed < cfg.fallbackCommitRate * r.stats.txns) {
        val ft = fallbackApply(table, ops, cfg.seed)
          .localCheckpoint(eager = eagerHygiene(cfg))
        if (eagerHygiene(cfg))
          Seq(table, ops).foreach { f =>
            if (GraftBridge.isCheckpointRoot(f)) GraftBridge.dropCheckpointBlocks(f)
          }
        table = ft
        stats += EpochStats(epoch, remaining, remaining, 0)
        remaining = 0
        epoch += 1
      }
    }
    RunResult(table, stats.result())
  }
}
