package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 SINK exercising the V2 batch commit protocol
  * end-to-end: each task's `DataWriter` folds its partition into a
  * (count, order-independent 60-bit XOR) pair, task `commit()` emits
  * that pair as its `WriterCommitMessage`, and ONLY the driver-side
  * `BatchWrite.commit(messages)` — called after every task succeeded —
  * merges the pairs and atomically writes the one-line result file.
  * `abort()` (any task failed) writes nothing and removes partials.
  *
  * This is the sink half of the [[GeneratorSource]] story (the
  * reference's device-table load path re-expressed as Spark's
  * pluggable commit protocol): correctness does NOT depend on tasks
  * running once — a re-executed task's message simply replaces the
  * failed attempt's (Spark only forwards messages from committed task
  * attempts), and the XOR is commutative so partition scheduling order
  * is irrelevant. ChecksumSinkSpec proves both halves: the committed
  * checksum equals a serial fold, and a mid-job task failure leaves NO
  * output file.
  *
  * At 100 TB this shape is the cheap data-integrity tripwire: a
  * byte-level content checksum of an arbitrary DataFrame in one pass
  * with 16 bytes of driver state per task, no shuffle, no sort. */
class ChecksumSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChecksumSink.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChecksumTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("ChecksumSink requires a path option")))
}

object ChecksumSink {
  /** Fixed input contract: (k LONG, payload STRING) — matches the
    * generator table, and keeps the row fold engine-independent. */
  val schema: StructType = new StructType()
    .add("k", LongType).add("payload", StringType)

  /** 60-bit row hash, same md5 convention as Portable.hash60. */
  def rowHash(k: Long, payload: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${k}_$payload".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.take(15), 16)
  }
}

final class ChecksumTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"graft_checksum($path)"
  override def schema(): StructType = ChecksumSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // overwrite == rewrite the file
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ChecksumBatchWrite(path)
      }
    }
}

final case class ChecksumMsg(count: Long, xor: Long) extends WriterCommitMessage

final class ChecksumBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ChecksumWriterFactory

  /** Driver-side, after ALL tasks committed: merge and write atomically
    * (temp file + move) so readers never observe a partial result. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var count = 0L
    var xor = 0L
    messages.foreach { case ChecksumMsg(c, x) => count += c; xor ^= x }
    val target = java.nio.file.Paths.get(path)
    Option(target.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp, s"count=$count xor=$xor\n".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path + ".tmp"))
  }
}

final class ChecksumWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var count = 0L
      private var xor = 0L
      override def write(row: InternalRow): Unit = {
        count += 1
        xor ^= ChecksumSink.rowHash(row.getLong(0), row.getUTF8String(1).toString)
      }
      override def commit(): WriterCommitMessage = ChecksumMsg(count, xor)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
