package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table access for the harness testdata (TESTDATA.md): one parquet file
  * per table under the given scale-factor directory. The Spark analog of
  * the reference's catalog — `database::table_vec`
  * (/root/reference/src/database/common/database.h:10-22) — is just
  * schema-on-read parquet scans; Catalyst gets filter pushdown and column
  * pruning on every access for free.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts's parquet physical type varies across testdata
      // generations: TIMESTAMP(NANOS) (readable only as an epoch-ns
      // BIGINT via nanosAsLong) or timestamp[us] (arrives as a timestamp;
      // nanosAsLong is a no-op there). Normalize BOTH to epoch-ns BIGINT:
      // every downstream query does integer ns arithmetic, which is also
      // exactly reproducible in the DuckDB oracle (epoch_ns is
      // precision-agnostic), unlike double-valued epoch().
      // nanosAsLong is read-ENABLING only (without it a nanos-era file
      // errors outright; it changes no other table's semantics), so
      // setting it here is safe. The session TIMEZONE is not: mutating it
      // mid-session would silently change later timestamp formatting
      // anywhere, so every entrypoint (Bench/Verify/AriaMain/SparkSpec)
      // pins UTC at session construction and requireUtc only asserts.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      requireUtc(spark)
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The NTZ/timestamp→epoch-ns cast in [[normalizeEventTs]] is only
    * correct under a UTC session. Sessions are pinned to UTC at
    * construction by every entrypoint; this guard turns a mis-built
    * session into a loud error instead of silently shifted event times. */
  def requireUtc(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    // accept any zone that MEANS UTC ("UTC", "Etc/UTC", "GMT", "+00:00",
    // "Z") — only the semantics matter; a literal string compare would
    // reject correctly-pinned sessions
    val isUtc =
      try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }
    require(isUtc,
      s"events reads need a UTC session timezone (got $tz); " +
        "set spark.sql.session.timeZone=UTC at SparkSession construction " +
        "like Bench/Verify do")
  }

  /** Rewrite `ts` to epoch-ns BIGINT whatever the file stored. For
    * timestamp-typed files the conversion is one expression above the
    * scan, so raw-ts range predicates evaluate post-scan there (the
    * event-time queries aggregate/window over ts rather than filter it,
    * so the board's plans are unaffected). NTZ wall-clock == epoch only
    * under a UTC session — `t` forces it, matching every entrypoint. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // nanos-era file: already epoch-ns
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet type $other; expected " +
          "INT64 epoch-ns or a timestamp")
    }

  /** Round-robin repartition iff the source scan has fewer input files
    * than the session parallelism. The harness files are single-row-group
    * parquet, so every scan is ONE task and CPU-heavy operators above it
    * serialize; production multi-split scans already parallelize, making
    * this a planning-time no-op there. Apply AFTER filters/projections so
    * scan pushdown/pruning is unaffected.
    *
    * The probe is `inputFiles` (an analyzed-plan walk) — NOT
    * `df.rdd.getNumPartitions`, which compiles a throwaway physical plan
    * per call; fanOut sits under every text/dedup query, so that cost
    * was paid across the whole board. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < target) df.repartition(target) else df
  }
}
