package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface: the reference's epoch loop is a
  * micro-batch pattern (SURVEY.md §2 T11), and the harness `events` table
  * is the stream analog. Everything here works identically on a streaming
  * or batch DataFrame (same Catalyst plans), so the batch queries
  * `agg_tumbling_events` / `window_sessionize` serve as the correctness
  * oracles for these transforms; the specs drive them through
  * MemoryStream to exercise watermarks, state and late-data semantics.
  *
  * Scale: windowed aggregation state is per (window, key) — bounded by
  * the watermark horizon; sessionization state is per user — bounded by
  * the timeout. Both shuffle once on the group key, the standard pattern
  * for 1000-executor streaming jobs.
  */
object Streaming {

  /** NORMALIZED events schema (ts as epoch-nanos LongType) — what
    * `Tables.t`/`readEventsStream` deliver, and the schema of every
    * fixture rewritten from their output. The PHYSICAL file schema may
    * differ (testdata generations store ts as TIMESTAMP(NANOS) or
    * timestamp[us]); streams over raw harness files must probe it with
    * [[eventsFileSchema]] instead of pinning this one. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Schema of an events parquet file AS STORED (driver-side footer
    * probe via a batch read — no data scan). With nanosAsLong set, a
    * nanos-era file yields ts: LongType; a micros-era file yields a
    * timestamp type. Pinning the wrong schema on readStream doesn't
    * error — parquet's vectorized reader hands back the raw int64, so
    * event times land 1000× off; probing makes the stream
    * generation-proof. */
  def eventsFileSchema(spark: SparkSession, eventsPath: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // normalizeEventTs's NTZ→epoch cast is only correct under UTC; every
    // entrypoint pins it at session construction — assert, don't mutate
    // (a mid-session timezone flip would silently change later
    // timestamp-sensitive operations session-wide)
    graft.operators.Tables.requireUtc(spark)
    spark.read.parquet(eventsPath).schema
  }

  /** File-based stream over an events directory (one-file-per-trigger
    * keeps micro-batches bounded), normalized so `ts` is epoch-ns
    * BIGINT regardless of the file's physical timestamp type. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema = eventsFileSchema(spark, s"$dir/events.parquet")
    // FileStreamSource needs a directory; the harness lays one file per
    // table in the sf dir, so glob-filter to the events file.
    graft.operators.Tables.normalizeEventTs(
      spark.readStream
        .schema(fileSchema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Normalize epoch-nanos to a TimestampType column for event-time ops. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling-window count/sum per event type with a watermark: the
    * streaming form of `Relational.tumblingAgg`. Works on batch frames
    * too (watermark is a no-op there). */
  def tumblingAgg(events: DataFrame, windowSec: Int = 3600,
                  watermarkSec: Int = 600): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", s"$watermarkSec seconds")
      .groupBy(window(col("event_time"), s"$windowSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** CDC fold: events as change records (key = user_id % keyMod,
    * tombstone on event_type = 'error') reduced to the last-writer-wins
    * state per key via max(struct(ts, event_id, …)) — (ts, event_id) is
    * a unique total order, so the lexicographic struct max is the
    * newest record under ANY micro-batch arrival order. Works on batch
    * frames identically (the StreamingSpec parity assertion). */
  def cdcSnapshot(events: DataFrame, keyMod: Long = 500L): DataFrame =
    events
      .select(expr(s"user_id % $keyMod").as("k"), col("ts"), col("event_id"),
        when(col("event_type") === "error", 0L).otherwise(1L).as("alive"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .groupBy("k")
      .agg(max(struct(col("ts"), col("event_id"), col("alive"), col("cents")))
        .as("last"))

  final case class EventIn(event_id: Long, ts: Long, user_id: Long,
                           event_type: String, value: Double)
  final case class SessionOut(user_id: Long, session_start_ns: Long,
                              session_end_ns: Long, n_events: Long)
  // public: Spark's state-store encoder codegen cannot instantiate a
  // private nested case class
  final case class SessionState(startNs: Long, endNs: Long, n: Long)

  /** Stateful sessionization with `flatMapGroupsWithState` and
    * EVENT-TIME timeouts: a session closes `gapSec` after its last event
    * in event time, i.e. when the watermark passes end+gap. Event-time
    * (not processing-time) timeouts make the computation replayable and
    * independent of wall-clock — required for a deterministic engine and
    * for backfills at scale. State per user is bounded by the watermark
    * horizon. */
  def sessionizeStream(events: Dataset[EventIn], gapSec: Int = 1800,
                       watermarkDelaySec: Int = 0): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapNs = gapSec.toLong * 1000000000L
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", s"$watermarkDelaySec seconds")
      .as[EventIn] // extra event_time column is carried by the plan, not the encoder
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(userId, s.startNs, s.endNs, s.n)).iterator
            state.remove()
            out
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts - s.endNs <= gapNs =>
                  cur = Some(SessionState(s.startNs, math.max(s.endNs, e.ts), s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.startNs, s.endNs, s.n)
                  cur = Some(SessionState(e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes session end + gap
              state.setTimeoutTimestamp((s.endNs + gapNs) / 1000000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact deduplication: drop rows whose content hash was
    * already seen, with state bounded by the watermark horizon
    * (`dropDuplicatesWithinWatermark` — duplicates are only guaranteed
    * dropped while their first occurrence is inside the watermark, which
    * is the scalable contract: unbounded dedup state is a memory leak at
    * 100 TB/day). Works on the same frame batch-side via dropDuplicates. */
  def dedupStream(docs: DataFrame, watermarkSec: Int = 3600): DataFrame = {
    val withTime = docs.withColumn("event_time",
      timestamp_micros(expr("ts div 1000")))
    if (docs.isStreaming)
      withTime
        .withWatermark("event_time", s"$watermarkSec seconds")
        .dropDuplicatesWithinWatermark("content_hash")
    else withTime.dropDuplicates("content_hash")
  }

  final case class UserRunning(n_events: Long, n_errors: Long, max_value: Double)
  final case class UserRunningOut(user_id: Long, n_events: Long,
                                  n_errors: Long, max_value: Double)

  /** transformWithState processor (the Spark 4 arbitrary-state API —
    * successor of flatMapGroupsWithState, with typed state handles, TTL
    * and timers): per-user running event statistics in one ValueState
    * record. Emits the running totals for every user seen in a batch
    * (Update mode). State is one fixed-size record per user — bounded
    * by key cardinality; a TTLConfig bounds it for keyspaces that grow
    * without bound. */
  class RunningStatsProcessor extends StatefulProcessor[Long, EventIn, UserRunningOut] {
    @transient private var state: ValueState[UserRunning] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState("running",
        Encoders.product[UserRunning], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timers: TimerValues): Iterator[UserRunningOut] = {
      val prev = if (state.exists()) state.get()
                 else UserRunning(0L, 0L, Double.NegativeInfinity)
      val cur = rows.foldLeft(prev) { (s, e) =>
        UserRunning(s.n_events + 1,
          s.n_errors + (if (e.event_type == "error") 1L else 0L),
          math.max(s.max_value, e.value))
      }
      state.update(cur)
      Iterator.single(UserRunningOut(key, cur.n_events, cur.n_errors, cur.max_value))
    }
  }

  /** Running per-user stats through transformWithState. Requires the
    * RocksDB state store provider (the API's backing store). */
  def runningStats(events: Dataset[EventIn]): Dataset[UserRunningOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  final case class BandIn(bkey: String, band: Int, doc_id: Long)
  final case class NearDupPair(a: Long, b: Long, band: Int)

  /** Stateful LSH bucket index for dedup-on-ingest: one ListState of
    * member doc ids per (band, bucket) key. A newly arrived doc emits a
    * candidate pair against every member already in its bucket (and
    * against earlier arrivals of the same batch), then joins the state —
    * so every unordered pair sharing the bucket is emitted EXACTLY once
    * per band, regardless of arrival order or batch boundaries
    * (pairs are (min,max)-normalized; one doc has one bucket per band,
    * so no within-band double-emission is possible).
    *
    * Scale: state is the band-bucket inverted index itself — the same
    * object the batch path joins against, held incrementally. Production
    * bounds per-bucket membership with a df cap (a saturated bucket
    * means the band is degenerate, not informative) and expires stale
    * members via TTL; both knobs drop pairs the batch oracle keeps, so
    * the harness form is uncapped over the bounded fixture. */
  class NearDupProcessor(cap: Int = Int.MaxValue)
      extends StatefulProcessor[String, BandIn, NearDupPair] {
    @transient private var members: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[BandIn],
                                 timers: TimerValues): Iterator[NearDupPair] = {
      val arrived = rows.toArray.sortBy(_.doc_id)
      // LinkedHashSet: O(1) membership for the re-delivery guard below,
      // insertion-ordered iteration for deterministic pair emission
      val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
      if (members.exists()) members.get().foreach(seen += _)
      val out = Seq.newBuilder[NearDupPair]
      arrived.foreach { d =>
        // idempotent under re-delivery: a doc_id already indexed (from a
        // replayed batch, an at-least-once source, or a within-batch
        // duplicate row) is neither re-paired nor re-appended — appending
        // twice would double-count it in every later mate's shared_bands.
        // The df cap makes bucket membership FIRST-cap-BY-ARRIVAL: a
        // saturated bucket indexes nothing further and emits nothing
        // further — state AND output per bucket are bounded by C(cap, 2)
        // no matter how duplicate-heavy the ingest is.
        if (!seen.contains(d.doc_id) && seen.size < cap) {
          seen.foreach { x =>
            out += NearDupPair(math.min(x, d.doc_id), math.max(x, d.doc_id), d.band)
          }
          seen += d.doc_id
          members.appendValue(d.doc_id)
        }
      }
      out.result().iterator
    }
  }

  /** Candidate near-dup pairs over a stream of band-bucket rows. */
  def nearDupStream(bands: Dataset[BandIn]): Dataset[NearDupPair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(_.bkey)
      .transformWithState(new NearDupProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** As [[nearDupStream]] with the PRODUCTION df cap engaged: each
    * (band, bucket) indexes only its first `cap` arrivals. */
  def nearDupStreamCapped(bands: Dataset[BandIn], cap: Int): Dataset[NearDupPair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(_.bkey)
      .transformWithState(new NearDupProcessor(cap),
        TimeMode.None(), OutputMode.Append())
  }

  /** Micro-batch sink driver (foreachBatch): the Spark idiom for the
    * reference's per-epoch host loop — each batch is a deterministic
    * set-transform, exactly like Aria's epochs. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, queryName: String,
                  outputMode: String = "update"): Unit = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    // processAllAvailable + stop, NOT AvailableNow + awaitTermination: a
    // pending processing-time state timeout keeps an AvailableNow query
    // alive until the timeout fires (potentially the full gap duration).
    q.processAllAvailable()
    q.stop()
  }

  /** As [[runToMemory]], returning the number of DATA-CARRYING
    * micro-batches the run took (trailing empty finalize/no-new-file
    * triggers excluded) — the observable a rate-limit/backpressure
    * query asserts on. */
  def runToMemoryCountingBatches(spark: SparkSession, streamed: DataFrame,
                                 queryName: String, outputMode: String): Int = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    q.recentProgress.count(_.numInputRows > 0)
  }

  /** As [[runToMemory]], returning the total rows the stateful operator
    * dropped as too late (`numRowsDroppedByWatermark` summed over the
    * run's progress reports) — the observable a late-data-accounting
    * query asserts on. */
  def runToMemoryCountingDropped(spark: SparkSession, streamed: DataFrame,
                                 queryName: String, outputMode: String): Long = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    q.recentProgress.flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
  }
}
