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

  test("all table schemas match the contract every query is written against") {
    // column name -> simpleString type, as LOADED through Tables.t (the
    // only access path queries use). A regeneration that renames,
    // retypes or drops a column fails here by name instead of
    // scattering DATATYPE_MISMATCH across the board. events.ts is
    // normalized by the loader, so bigint is the contract regardless of
    // the file's physical generation.
    val expected = Map(
      "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
      "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
        "n_regionkey" -> "int"),
      "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
        "c_nationkey" -> "int", "c_acctbal" -> "double",
        "c_mktsegment" -> "string"),
      "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
        "s_nationkey" -> "int", "s_acctbal" -> "double"),
      "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
        "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
        "p_retailprice" -> "double"),
      "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_orderstatus" -> "string", "o_totalprice" -> "double",
        "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
      "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
        "l_suppkey" -> "bigint", "l_linenumber" -> "int",
        "l_quantity" -> "double", "l_extendedprice" -> "double",
        "l_discount" -> "double", "l_tax" -> "double",
        "l_returnflag" -> "string", "l_linestatus" -> "string",
        "l_shipdate" -> "timestamp_ntz"),
      "events" -> Seq("event_id" -> "bigint", "ts" -> "bigint",
        "user_id" -> "bigint", "event_type" -> "string",
        "value" -> "double", "props" -> "string"),
      "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
        "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
      "embeddings" -> Seq("vec_id" -> "bigint",
        "embedding" -> "array<float>", "label" -> "int"))
    val drift = Tables.names.flatMap { name =>
      val got = Tables.t(spark, sf("sf0.001"), name).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toSeq
      if (got == expected(name)) Nil
      else Seq(s"$name:\n  expected ${expected(name)}\n  got      $got")
    }
    assert(drift.isEmpty, "testdata schema drift:\n" + drift.mkString("\n"))
  }
}
