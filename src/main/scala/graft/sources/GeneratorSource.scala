package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 table: a deterministic key/payload generator
  * exposed as a first-class Spark table with REAL scan-time pruning.
  *
  * This is the Spark-first re-expression of the reference's bulk-load
  * generator (S15, `database/ycsb/Transction_y.h:17-26` — a host loop
  * filling a device KV table): instead of materializing rows and then
  * filtering, the GENERATOR is the table, and the engine's pushdown
  * machinery narrows what gets generated at all:
  *
  *  - `SupportsPushDownFilters`: comparisons on `k` narrow the
  *    generated key range exactly (the pushed filters need no
  *    post-scan re-evaluation); all other predicates stay post-scan.
  *  - `SupportsPushDownRequiredColumns`: only requested columns are
  *    materialized (the md5 payload — the expensive column — is never
  *    computed for a `count(k)`).
  *  - partition pruning: `planInputPartitions` intersects the uniform
  *    slice grid with the narrowed range and emits only non-empty
  *    slices, so a 50%-range filter halves the task count, not just
  *    the per-task work.
  *  - `SupportsPushDownLimit`: a pushed limit caps each emitted slice
  *    (best-effort per the contract; Spark re-applies the exact limit).
  *
  * Payload is md5-portable (`md5("gen_" + k)`) so a DuckDB oracle can
  * regenerate the identical table with `generate_series` + `md5` —
  * the source's output is oracle-verified like every other query, not
  * just schema-checked. At 100 TB this shape matters because synthetic
  * benchmark/backfill inputs are generated IN the scan (no staging
  * write), partition count scales with `slices`, and pruning composes
  * with everything downstream.
  */
class GeneratorSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeneratorSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GeneratorTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(100000L),
      slices = Option(properties.get("slices")).map(_.toInt).getOrElse(8))
}

object GeneratorSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** The portable payload: md5 hex of "gen_<k>" (DuckDB: md5('gen_'||k)). */
  def payload(k: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"gen_$k".getBytes("UTF-8")).map("%02x".format(_)).mkString
}

final class GeneratorTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_gen(rows=$rows)"
  override def schema(): StructType = GeneratorSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeneratorScanBuilder(rows, slices)
}

final class GeneratorScanBuilder(rows: Long, slices: Int)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var lo = 0L            // narrowed key range [lo, hi)
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = GeneratorSource.schema
  private var limit = -1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // integral literals may arrive boxed as Integer or Long
    val (accepted, residual) = filters.partition {
      case EqualTo("k", _: Number) => true
      case GreaterThan("k", _: Number) => true
      case GreaterThanOrEqual("k", _: Number) => true
      case LessThan("k", _: Number) => true
      case LessThanOrEqual("k", _: Number) => true
      case IsNotNull("k") => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("k", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case GreaterThan("k", v: Number) => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("k", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("k", v: Number) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("k", v: Number) => hi = math.min(hi, v.longValue + 1)
      case IsNotNull("k") => ()
      case _ => ()
    }
    pushed = accepted
    residual // post-scan filters Spark must still evaluate
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan =
    new GeneratorScan(math.max(lo, 0L), math.max(math.min(hi, rows), lo),
      rows, slices, required, limit)
}

final class GeneratorScan(lo: Long, hi: Long, rows: Long, slices: Int,
                          required: StructType, limit: Int)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"graft_gen range=[$lo,$hi) of $rows, cols=${required.fieldNames.mkString(",")}" +
      (if (limit >= 0) s", limit=$limit" else "")

  /** Uniform slice grid over [0, rows), intersected with the narrowed
    * range — empty slices are pruned, so the task count shrinks with
    * the filter, not just per-task work. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => GenRange(math.max(lo, i * per), math.min(hi, (i + 1) * per), limit))
      .filter(r => r.start < r.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames)
}

final case class GenRange(start: Long, end: Long, limit: Int) extends InputPartition

final class GenReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[GenRange]
    new PartitionReader[InternalRow] {
      private var k = r.start - 1
      private var emitted = 0L
      private val cap = if (r.limit >= 0) r.limit.toLong else Long.MaxValue
      override def next(): Boolean = { k += 1; emitted += 1; k < r.end && emitted <= cap }
      override def get(): InternalRow =
        new GenericInternalRow(cols.map[Any] {
          case "k" => k
          case "bucket" => k % 100
          case "payload" => UTF8String.fromString(GeneratorSource.payload(k))
        })
      override def close(): Unit = ()
    }
  }
}
