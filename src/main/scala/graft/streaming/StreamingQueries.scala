package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness-facing queries that drive the REAL Structured Streaming
  * engine (file source → stateful transforms → memory sink, run to
  * completion) and return the final result as a DataFrame. The events
  * table arrives as a single file, so the run is one micro-batch plus
  * the watermark-advance batch — fully deterministic, which is what
  * makes an exact DuckDB oracle possible:
  *
  *  - tumbling agg (complete mode): final state = the batch aggregation.
  *  - sessionization (append mode, event-time timeouts): emitted rows =
  *    sessions closed in-batch (a later same-user event exceeded the
  *    gap) ∪ sessions closed by the final watermark (end+gap below it).
  *    Each user's LAST session stays open unless the watermark passed
  *    it — the oracle reproduces exactly that, watermark truncation
  *    (ns → ms) included.
  *  - streaming dedup (append mode): first occurrence per content hash;
  *    projected to the hash column the surviving-row set is the
  *    distinct-hash set.
  */
object StreamingQueries {

  private val gapSec = 1800
  private val counter = new java.util.concurrent.atomic.AtomicInteger
  private def unique(prefix: String): String =
    s"${prefix}_${counter.incrementAndGet()}"

  /** Streaming tumbling-window aggregation, run to completion. Output
    * contract matches the batch `Relational.tumblingAgg`. */
  def streamTumblingAgg(spark: SparkSession, dir: String): DataFrame = {
    val name = unique("stream_tumbling")
    Streaming.runToMemory(spark,
      Streaming.tumblingAgg(Streaming.readEventsStream(spark, dir)),
      name, outputMode = "complete")
    spark.table(name).orderBy("window_start", "event_type")
  }

  val streamTumblingAggSql: String =
    """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Stateful streaming sessionization (flatMapGroupsWithState with
    * event-time timeouts), run to completion; returns the closed
    * sessions. */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = unique("stream_sessions")
    val events = Streaming.readEventsStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streaming.EventIn]
    Streaming.runToMemory(spark,
      Streaming.sessionizeStream(events, gapSec = gapSec).toDF(),
      name, outputMode = "append")
    // session bounds leave as µs, not ns: DuckDB reads parquet
    // TIMESTAMP(NANOS) truncated to µs, so raw-ns output could never
    // hash-match (the engine still sessionizes on exact ns internally)
    spark.table(name)
      .select(col("user_id"),
        expr("session_start_ns div 1000").as("session_start_us"),
        expr("session_end_ns div 1000").as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
  }

  /** Closed sessions in SQL: gap-split sessions (the batch pattern),
    * emitted iff not the user's last session (closed in-batch by a
    * later event) or end+gap fell below the final watermark. Watermark
    * arithmetic mirrors Spark's: event time is ns→ms truncated, the
    * timeout timestamp is (end_ns + gap_ns) / 1e6 ms, and a timeout
    * fires when it is strictly below the watermark. */
  val streamSessionizeSql: String =
    s"""WITH gaps AS (
       |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
       |         lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tns
       |  FROM events
       |), sess AS (
       |  SELECT user_id, tns,
       |         sum(CASE WHEN prev_tns IS NULL OR tns - prev_tns > ${gapSec}000000000
       |                  THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY user_id ORDER BY tns, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM gaps
       |), agg AS (
       |  SELECT user_id, sid, min(tns) AS session_start_ns,
       |         max(tns) AS session_end_ns, count(*) AS n_events
       |  FROM sess GROUP BY user_id, sid
       |), lasts AS (
       |  SELECT *, max(sid) OVER (PARTITION BY user_id) AS max_sid FROM agg
       |), wm AS (SELECT max(epoch_ns(ts)) // 1000000 AS wm_ms FROM events)
       |SELECT user_id, session_start_ns // 1000 AS session_start_us,
       |       session_end_ns // 1000 AS session_end_us, n_events
       |FROM lasts, wm
       |WHERE sid < max_sid
       |   OR (session_end_ns + ${gapSec}000000000) // 1000000 < wm_ms
       |ORDER BY user_id, session_start_us""".stripMargin

  /** Streaming exact dedup (dropDuplicatesWithinWatermark), run to
    * completion; projected to the content hash so the output is the
    * deterministic distinct-hash set (which physical row survives a
    * duplicate group is engine-internal). */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val name = unique("stream_dedup")
    // coalesce on both engines: a NULL props must hash like '', not be
    // silently dropped (Spark concat_ws skips NULLs, DuckDB || nulls out)
    val docs = Streaming.readEventsStream(spark, dir)
      .select(col("ts"),
        md5(concat_ws("|", col("event_type"), coalesce(col("props"), lit(""))))
          .as("content_hash"))
    Streaming.runToMemory(spark,
      Streaming.dedupStream(docs).select("content_hash"),
      name, outputMode = "append")
    spark.table(name).orderBy("content_hash")
  }

  val streamDedupSql: String =
    """SELECT DISTINCT md5(event_type || '|' || coalesce(props, '')) AS content_hash
      |FROM events ORDER BY content_hash""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_agg" -> streamTumblingAgg,
    "stream_sessionize" -> streamSessionize,
    "stream_dedup" -> streamDedup)

  val oracles: Map[String, String] = Map(
    "stream_tumbling_agg" -> streamTumblingAggSql,
    "stream_sessionize" -> streamSessionizeSql,
    "stream_dedup" -> streamDedupSql)
}
