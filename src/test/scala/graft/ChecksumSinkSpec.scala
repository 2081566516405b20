package graft

import org.apache.spark.sql.functions._
import graft.sources.ChecksumSink

/** The DSv2 write path: committed output equals a serial fold of the
  * input, the checksum is partitioning-invariant (commutative merge),
  * and a failed job leaves NO output file (the commit protocol's
  * all-or-nothing promise). */
class ChecksumSinkSpec extends SparkSpec {

  private def gen(n: Long, slices: Int) =
    spark.read.format("graft.sources.GeneratorSource")
      .option("rows", n.toString).option("slices", slices.toString).load()
      .select("k", "payload")

  test("committed checksum equals the serial fold, at any partitioning") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val want = (0L until 500L).foldLeft((0L, 0L)) { case ((c, x), k) =>
      (c + 1, x ^ ChecksumSink.rowHash(k, graft.sources.GeneratorSource.payload(k)))
    }
    for ((slices, tag) <- Seq((1, "one"), (7, "seven"))) {
      val path = s"$tmp/sum_$tag.txt"
      gen(500L, slices).write.format("graft.sources.ChecksumSink")
        .option("path", path).mode("append").save()
      val line = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8").trim
      assert(line === s"count=${want._1} xor=${want._2}", s"slices=$slices")
    }
  }

  test("a failing task aborts the job and leaves no output file") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink_fail").toString
    val path = s"$tmp/never.txt"
    val boom = udf((k: Long) => {
      if (k == 400L) throw new RuntimeException("planted failure")
      k
    })
    val failing = gen(500L, 4).select(boom(col("k")).as("k"), col("payload"))
    intercept[Exception] {
      failing.write.format("graft.sources.ChecksumSink")
        .option("path", path).mode("append").save()
    }
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "abort must not publish a result file")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".tmp")),
      "abort must clean the temp file")
  }
}
