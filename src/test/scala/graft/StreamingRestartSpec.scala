package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** Durability: a streaming query killed mid-stream and restarted from
  * its checkpoint must process every input exactly once — the property
  * that makes a 100 TB streaming pipeline operable (executors die; the
  * checkpoint + file-sink transaction log carry the guarantee). */
class StreamingRestartSpec extends SparkSpec {

  test("file-sink query restarted from checkpoint is exactly-once across new input") {
    val base = Files.createTempDirectory("graft_restart").toString
    val srcDir = s"$base/src"
    val ckpt = s"$base/ckpt"
    val outDir = s"$base/out"
    Files.createDirectories(Paths.get(srcDir))
    val eventsFile = Paths.get(sf("sf0.001"), "events.parquet")
    // raw harness file: probe the stored schema (ts physical type varies
    // across testdata generations) instead of pinning the normalized one
    val fileSchema = Streaming.eventsFileSchema(spark, eventsFile.toString)

    // A raw projection, not an aggregation (append-mode file sinks
    // reject aggregations): exactly-once is a property of source
    // offsets + the sink transaction log, not of the transform.
    def startProjection() = {
      val stream = spark.readStream
        .schema(fileSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .select(col("event_id"), col("event_type"))
      stream.writeStream
        .format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }

    // leg 1: one input file, run to completion, stop
    Files.copy(eventsFile, Paths.get(srcDir, "f1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q1 = startProjection()
    q1.awaitTermination()
    val n1 = spark.read.parquet(outDir).count()
    val expected = spark.read.schema(fileSchema)
      .parquet(srcDir + "/f1.parquet").count()
    assert(n1 === expected, s"leg 1 wrote $n1, source has $expected")

    // leg 2: a second file arrives; restart from the SAME checkpoint —
    // f1 must not be reprocessed, f2 must be picked up
    Files.copy(eventsFile, Paths.get(srcDir, "f2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q2 = startProjection()
    q2.awaitTermination()
    val out = spark.read.parquet(outDir)
    assert(out.count() === 2 * expected,
      s"restart not exactly-once: ${out.count()} vs ${2 * expected}")
    // every event id appears exactly twice (once per source file), never
    // more (no reprocessing) and never less (no loss)
    val dupes = out.groupBy("event_id").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    assert(dupes === 0L, s"$dupes event ids with wrong multiplicity")
  }
}
