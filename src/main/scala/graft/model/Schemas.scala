package graft.model

/** Typed rows for the transaction engine (SURVEY.md §1.5 mapping).
  *
  * Reference structs:
  *  - KV record: `ycsb::Key`(uint32) + `ycsb::Value`(metadata word +
  *    char[10][10]) — /root/reference/src/cuda/kv.cuh:31-51. We unpack the
  *    metadata word `[epoch|rts|wts]`
  *    (/root/reference/src/cuda/metadatahelper.cuh:94-105) into plain int
  *    columns; packing is an implementation detail, not semantics.
  *  - `Transction<N>` txn with fixed op arrays —
  *    /root/reference/src/database/ycsb/Transction_y.h:11-68. We explode ops
  *    to rows (read/write-set entries, TrancM_func.cuh:42-58).
  */
final case class KvRow(
    key: Int,
    f0: String, f1: String, f2: String, f3: String, f4: String,
    f5: String, f6: String, f7: String, f8: String, f9: String)

/** One operation of one transaction — a read-set entry; `isUpdate` rows are
  * also write-set entries (SURVEY.md §2.5.4). */
final case class OpRow(tid: Int, epoch: Int, opIdx: Int, key: Int, isUpdate: Boolean)

/** Per-key epoch reservation (output of Reserve, ≙ metadata word rts/wts;
  * 0 = unreserved sentinel — /root/reference/src/cuda/metadatahelper.cuh:36-90). */
final case class Reservation(key: Int, rts: Int, wts: Int)

/** Per-transaction hazard flags + commit decision (Commit/Install phases,
  * /root/reference/src/database/ycsb/TrancM_func.cuh:126-250). */
final case class TxnVerdict(tid: Int, raw: Boolean, war: Boolean, waw: Boolean, abort: Boolean)

/** Per-epoch engine stats (observable behavior of the epoch loop,
  * /root/reference/src/database/ycsb/db.h:104-125). */
final case class EpochStats(epoch: Int, txns: Long, committed: Long, aborted: Long)

/** Workload/engine configuration — mirrors `Transction_Context` defaults
  * (/root/reference/src/database/common/Transction.h:13-34). */
final case class AriaConfig(
    nTxns: Int = 150,
    maxOps: Int = 30,
    writePct: Int = 40,
    keysMax: Int = 20000,
    tableKeys: Int = 199999,
    reorder: Boolean = false,
    seed: Long = 42L,
    maxEpochs: Int = 64,
    // engage the decade-scale eager checkpoint-and-free path regardless of
    // tableKeys — lets tests exercise the eager drain at small fixtures
    forceEagerHygiene: Boolean = false,
    // Aria-paper fallback (§"Falling back to deterministic locking"):
    // when an epoch's commit rate drops below this fraction, apply the
    // residual batch as ONE deterministic per-key-ordered serial pass
    // instead of grinding more min-Tid epochs. 0.0 (the default, and the
    // reference's behavior — it has no fallback and survives only by its
    // 150-txn/20k-key operating point, Transction.h:24-33) disables it.
    fallbackCommitRate: Double = 0.0)
