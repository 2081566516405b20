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

  test("CDC apply restarted from checkpoint equals the uninterrupted fold") {
    import spark.implicits._
    // The recovery leg of stream_cdc_apply's arrival-order-invariance
    // claim: the LWW fold (max over the (ts, event_id) total order) must
    // come out IDENTICAL when the stream is killed mid-history and
    // restarted from its checkpoint — leg-1 state must carry over (not
    // reset), leg-1 input must not replay, and a leg-2 record OLDER than
    // the held state must lose exactly as it would have in one run.
    val base = Files.createTempDirectory("graft_cdc_restart").toString
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
    def snapshotOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.filter(col("last.alive") === 1L)
        .select(col("k"), col("last.ts"), col("last.cents")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // complete-mode foreachBatch: every micro-batch emits the full
    // snapshot; the last one wins (memory sinks refuse recovery)
    def runLeg(): Map[Long, (Long, Long)] = {
      val buf = scala.collection.mutable.Map[Long, (Long, Long)]()
      val events = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[Streaming.EventIn].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      val q = Streaming.cdcSnapshot(events).writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val snap = snapshotOf(df)
          buf.synchronized { buf.clear(); buf ++= snap }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      buf.toMap
    }
    val b1 = Seq(
      Streaming.EventIn(1L, 1000L, 1L, "view", 10.0),
      Streaming.EventIn(2L, 2000L, 1L, "view", 20.0), // k1 newest in leg 1
      Streaming.EventIn(3L, 500L, 2L, "view", 5.0),
      Streaming.EventIn(4L, 500L, 3L, "error", 0.0)) // k3 tombstoned
    writeBatch("b1.parquet", b1)
    val leg1 = runLeg()
    assert(leg1 === Map(1L -> (2000L, 2000L), 2L -> (500L, 500L)),
      s"leg 1 snapshot wrong: $leg1")

    // kill + restart from the SAME checkpoint with out-of-order arrivals
    val b2 = Seq(
      Streaming.EventIn(5L, 1500L, 1L, "view", 99.0), // OLDER than held k1 state
      Streaming.EventIn(6L, 3000L, 2L, "error", 0.0), // tombstones k2
      Streaming.EventIn(7L, 100L, 4L, "view", 7.0)) // new key
    writeBatch("b2.parquet", b2)
    val leg2 = runLeg()
    assert(leg2.get(1L) === Some((2000L, 2000L)),
      "k1 must keep leg-1's newer record — held state lost or leg 1 replayed")
    assert(!leg2.contains(2L), "k2's leg-2 tombstone must apply")
    assert(leg2.get(4L) === Some((100L, 700L)))

    // the uninterrupted-run oracle: one batch fold over ALL records
    val uninterrupted = snapshotOf(Streaming.cdcSnapshot((b1 ++ b2).toDF()))
    assert(leg2 === uninterrupted,
      s"recovery diverged from the uninterrupted fold: $leg2 vs $uninterrupted")
  }
}
