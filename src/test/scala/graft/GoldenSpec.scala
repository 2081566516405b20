package graft

import org.apache.spark.sql.functions._
import graft.gen.Workload

/** Golden values pinning the deterministic generator across builds:
  * the Aria oracle (serial replay) recomputes alongside the engine, so
  * it cannot catch BOTH drifting together after a generator change.
  * These literals can only change with an intentional generator edit. */
class GoldenSpec extends SparkSpec {

  test("kv table generation is frozen (seed 42, 120 keys)") {
    val cs = Workload.kvTable(spark, 120, 42L)
      .select(expr("bit_xor(xxhash64(key, f0, f1, f2, f3, f4, f5, f6, f7, f8, f9))"))
      .head().getLong(0)
    assert(cs === -2835884337890038845L, f"generator drift: checksum=$cs%d")
  }

  test("txn ops generation is frozen (seed 42, 60 txns)") {
    val cs = Workload.txnOps(spark, 60, 10, 40, 80, 42L)
      .select(expr("bit_xor(xxhash64(tid, epoch, opIdx, key, isUpdate))"))
      .head().getLong(0)
    // refreshed after the zero-op explode guard (sequence(0,-1) used to
    // fabricate two phantom ops for every n_ops=0 txn)
    assert(cs === -937435756510079962L, f"generator drift: checksum=$cs%d")
  }
}
