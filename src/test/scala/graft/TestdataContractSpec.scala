package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}
import graft.operators.Tables
import graft.streaming.Streaming

/** Contract guard against silent testdata regeneration: the harness has
  * already shipped `events.ts` as parquet TIMESTAMP(NANOS) in one
  * generation and timestamp[us] in another, and a loader pinned to one
  * physical type fails 25 queries at once when the other arrives. These
  * assertions load events from the LIVE testdata dir and pin the
  * normalized contract — ts is epoch-ns BIGINT in the data's known epoch
  * range — so the next drift fails one targeted test instead of the
  * board. */
class TestdataContractSpec extends SparkSpec {

  // epoch-ns bounds: 2000-01-01 .. 2100-01-01. A micros value read as ns
  // lands 1000x below the lower bound; an unconverted raw int64 of
  // micros is 1970+54d — both fail loudly.
  private val loNs = 946684800L * 1000000000L
  private val hiNs = 4102444800L * 1000000000L

  private def assertNsRange(lo: Long, hi: Long, who: String): Unit = {
    assert(lo >= loNs && hi <= hiNs,
      s"$who ts range [$lo, $hi] outside epoch-ns bounds [$loNs, $hiNs] — " +
        "testdata physical type drifted again? (see Tables.normalizeEventTs)")
  }

  test("batch loader normalizes live events.ts to epoch-ns BIGINT") {
    val ev = Tables.t(spark, sf("sf0.001"), "events")
    assert(ev.schema("ts").dataType === LongType)
    val r = ev.agg(min(col("ts")), max(col("ts"))).head
    assertNsRange(r.getLong(0), r.getLong(1), "Tables.t")
  }

  test("streaming loader normalizes live events.ts identically") {
    val stream = Streaming.readEventsStream(spark, sf("sf0.001"))
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType === LongType)
    assert(stream.schema.fieldNames === Streaming.eventsSchema.fieldNames)
    Streaming.runToMemory(spark,
      stream.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")),
      "testdata_contract_ts", outputMode = "complete")
    val r = spark.table("testdata_contract_ts").head
    assertNsRange(r.getLong(0), r.getLong(1), "readEventsStream")
  }

  test("normalizeEventTs handles both physical generations equivalently") {
    import spark.implicits._
    // micros-era shape: a timestamp column
    val micros = Seq(1700000000123456L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val fromTs = Tables.normalizeEventTs(micros).head.getLong(0)
    assert(fromTs === 1700000000123456000L)
    // NTZ variant (what parquet timestamp[us] infers to on read)
    val ntz = micros.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(Tables.normalizeEventTs(ntz).head.getLong(0) === fromTs)
    // nanos-era shape: already epoch-ns BIGINT — passthrough
    val longs = Seq(1700000000123456789L).toDF("ts")
    assert(Tables.normalizeEventTs(longs).head.getLong(0) === 1700000000123456789L)
  }

  test("eventsFileSchema probes the stored type without erroring") {
    val s: StructType = Streaming.eventsFileSchema(
      spark, sf("sf0.001") + "/events.parquet")
    val t = s("ts").dataType
    assert(t === LongType || t === TimestampType || t === TimestampNTZType)
  }
}
