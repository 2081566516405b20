package graft

import graft.model.{KvRow, OpRow}
import graft.gen.Workload

/** Typed Dataset API over the engine's model classes (the type-safe
  * surface SURVEY.md §7.1 prescribes for the txn engine): encoders,
  * typed filter/map, groupByKey aggregation — and equivalence with the
  * untyped plans. */
class TypedApiSpec extends SparkSpec {

  test("kv table round-trips through Dataset[KvRow]") {
    import spark.implicits._
    val ds = Workload.kvTable(spark, nKeys = 50, seed = 1L).as[KvRow]
    val rows = ds.collect()
    assert(rows.length === 50)
    assert(rows.forall(r => r.f0.length == 10 && r.f9.length == 10))
    // typed filter+map == untyped filter+select
    val typed = ds.filter(_.key % 2 == 0).map(_.key).collect().sorted.toSeq
    val untyped = Workload.kvTable(spark, 50, 1L)
      .filter(org.apache.spark.sql.functions.col("key") % 2 === 0)
      .select("key").collect().map(_.getInt(0)).sorted.toSeq
    assert(typed === untyped)
  }

  test("typed groupByKey agg equals untyped groupBy on ops") {
    import spark.implicits._
    val ops = Workload.txnOps(spark, nTxns = 40, maxOps = 10, writePct = 40,
      keysMax = 30, seed = 7L)
    val typed = ops.as[OpRow]
      .groupByKey(_.key)
      .mapGroups((k, it) => (k, it.map(_.tid).min))
      .collect().toMap
    val untyped = graft.aria.Aria.reserve(ops)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(typed === untyped)
  }
}
