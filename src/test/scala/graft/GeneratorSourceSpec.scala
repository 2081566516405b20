package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.{GeneratorScan, GeneratorSource}

/** The custom DSv2 generator table: the pruning CLAIMS are asserted
  * against the physical plan (pushed range, pruned columns, pruned
  * partitions, pushed limit), and the generated values against a
  * serial MessageDigest replay. */
class GeneratorSourceSpec extends SparkSpec {

  private def gen(rows: Long = 200000L, slices: Int = 16): DataFrame =
    spark.read.format("graft.sources.GeneratorSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  private def scanOf(df: DataFrame): GeneratorScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[GeneratorScan]
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("full scan generates exactly `rows` rows") {
    assert(gen(1000L, 4).count() === 1000L)
  }

  test("key-range filter is pushed: narrowed range, no post-scan k-filter, pruned slices") {
    val df = gen().filter(col("k") >= 50000L && col("k") < 150000L)
      .select("bucket", "payload")
    val scan = scanOf(df)
    assert(scan.description().contains("range=[50000,150000)"))
    // 16 uniform slices of 12500 over [0,200000): the filter covers
    // slices 4..11 — the other 8 are never planned
    assert(scan.toBatch.planInputPartitions().length === 8)
    // the range comparisons are consumed by the source, not re-evaluated
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.matches("(?s).*Filter.*k#.*"), s"post-scan k filter in:\n$planStr")
    assert(df.count() === 100000L)
  }

  test("column pruning reaches the scan (payload never materialized for a count)") {
    val df = gen().select("k")
    assert(scanOf(df).readSchema().fieldNames.toSeq === Seq("k"))
    val pruned = gen().filter(col("k") < 10L).select("bucket", "payload")
    assert(scanOf(pruned).readSchema().fieldNames.toSeq.sorted === Seq("bucket", "payload"))
  }

  test("limit is pushed into the scan (best-effort per slice)") {
    val df = gen().limit(7)
    assert(scanOf(df).description().contains("limit=7"))
    assert(df.count() === 7L)
  }

  test("payloads replay from a serial MessageDigest walk; residual filters stay post-scan") {
    val got = gen(64L, 2).filter(col("k") >= 60L).select("k", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === (60L until 64L).map(k => k -> GeneratorSource.payload(k)).toMap)
    // a payload predicate is NOT pushable: it must survive as a post-scan filter
    val df = gen(1000L, 4).filter(col("payload").startsWith("a") && col("k") < 500L)
    assert(df.queryExecution.executedPlan.toString.contains("StartsWith"))
    val want = (0L until 500L).count(k => GeneratorSource.payload(k).startsWith("a"))
    assert(df.count() === want.toLong)
  }
}
