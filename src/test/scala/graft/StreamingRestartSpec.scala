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

  test("transformWithState state survives a checkpoint restart (RocksDB)") {
    import spark.implicits._
    // STATEFUL durability, the stronger property beyond source/sink
    // exactly-once: per-user running counts must CONTINUE from the
    // RocksDB checkpoint on restart, not reset — replaying leg 1 or
    // losing its state both break the arithmetic below.
    // The session is JVM-shared across suites: restore the provider
    // afterwards so later streaming tests keep exercising the default.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val savedProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val base = Files.createTempDirectory("graft_tws_restart").toString
    val srcDir = s"$base/src"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(srcDir))
    def writeBatch(name: String, rows: Seq[Streaming.EventIn]): Unit = {
      val stage = s"$base/stage_$name"
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(srcDir, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // foreachBatch, not the memory sink: memory-sink queries refuse
    // checkpoint recovery; foreachBatch checkpoints batch ids and is
    // the production micro-batch sink pattern anyway
    def runLeg(): Map[Long, Streaming.UserRunningOut] = {
      val buf = scala.collection.mutable.Map[Long, Streaming.UserRunningOut]()
      val events = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[Streaming.EventIn].schema)
        .parquet(srcDir).as[Streaming.EventIn]
      val q = Streaming.runningStats(events).writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[Streaming.UserRunningOut], _: Long) =>
          val rows = ds.collect()
          buf.synchronized { rows.foreach(r => buf(r.user_id) = r) }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      buf.toMap
    }
    // leg 1: user 7 sees 2 events (1 error), user 8 sees 1
    writeBatch("b1.parquet", Seq(
      Streaming.EventIn(1L, 1000L, 7L, "error", 5.0),
      Streaming.EventIn(2L, 2000L, 7L, "view", 9.0),
      Streaming.EventIn(3L, 3000L, 8L, "view", 1.0)))
    val leg1 = runLeg()
    assert(leg1(7L) === Streaming.UserRunningOut(7L, 2L, 1L, 9.0))
    assert(leg1(8L) === Streaming.UserRunningOut(8L, 1L, 0L, 1.0))
    // leg 2: NEW query from the SAME checkpoint; counts must continue
    writeBatch("b2.parquet", Seq(
      Streaming.EventIn(4L, 4000L, 7L, "error", 2.0),
      Streaming.EventIn(5L, 5000L, 9L, "view", 4.0)))
    val leg2 = runLeg()
    assert(leg2(7L) === Streaming.UserRunningOut(7L, 3L, 2L, 9.0),
      "user 7 must continue from (2 events, 1 error), not reset or replay")
    assert(leg2(9L) === Streaming.UserRunningOut(9L, 1L, 0L, 4.0))
    assert(!leg2.contains(8L), "user 8 had no leg-2 input; update mode must not re-emit it")
    } finally savedProvider.fold(spark.conf.unset(providerKey))(
      spark.conf.set(providerKey, _))
  }
}
