package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the deliberately-skewed scale fixture for the salted-skew
  * stress measurement (BASELINE.md "Skewed 8× fixture" section).
  *
  * The driver testdata's `l_returnflag` is near-uniform (~33% per
  * value), so the hot-key scenario the salting operators
  * (`operators/Skew.saltedAgg`, `operators/Relational4.saltedJoin`)
  * exist for never actually occurs in the stock tables. This tool
  * rewrites the flag DETERMINISTICALLY (hash of (l_orderkey,
  * l_linenumber), never `rand()`) to a 50/30/20 split — one key ('N')
  * holding half of all rows — and replicates the table `factor`× with
  * `l_orderkey` offset per replica so replica key ranges never collide:
  * the salt hash in both salted operators keys on (l_orderkey,
  * l_linenumber), and its spread domain (the distinct-pair count) must
  * scale ×factor, not fold replicas onto the same cells. (The stock
  * testdata itself reuses ~24% of pairs — a generator artifact the
  * fixture inherits within each replica; SkewFixtureSpec pins the
  * ×factor scaling.)
  *
  * Usage: runMain graft.tools.SkewFixture <srcSfDir> <outDir> <factor>
  * Writes <outDir>/lineitem.parquet; ONLY-mode bench runs then point
  * SPARK_GRAFT_SF_DIR at <outDir> (the two salted queries read nothing
  * but lineitem, and ONLY-mode skips the full-board warmup).
  */
object SkewFixture {
  /** Replica key offset — beyond any stock l_orderkey (max 149,999 at
    * sf0.1), so replica key ranges never overlap. */
  private[graft] val ReplicaOffset = 1000000L

  /** The skewed, replicated frame (pure; main writes it to parquet). */
  private[graft] def skewedLineitem(spark: SparkSession, src: String,
                                    factor: Int): DataFrame = {
    val bucket = pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10L))
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    // a source whose keys reach the offset would fold replica ranges
    // onto each other — the salt-spread guarantee the fixture exists for
    // would silently break; refuse instead (max() is NULL on an empty
    // source — that's its own refusal, not an NPE)
    val maxKey = Option(lineitem.agg(max("l_orderkey")).head().get(0))
      .map(_.asInstanceOf[Long])
    require(maxKey.exists(_ < ReplicaOffset),
      maxKey.fold(s"source $src/lineitem.parquet is empty — nothing to skew")(k =>
        s"source l_orderkey reaches $k >= ReplicaOffset $ReplicaOffset; " +
          "replica key ranges would collide — raise ReplicaOffset for this source"))
    lineitem
      .withColumn("l_returnflag",
        when(bucket < 5, "N").when(bucket < 8, "A").otherwise("R"))
      .crossJoin(spark.range(factor).select(col("id").as("replica")))
      .withColumn("l_orderkey", col("l_orderkey") + col("replica") * ReplicaOffset)
      .drop("replica")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: SkewFixture <srcSfDir> <outDir> <factor>")
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-skew-fixture")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    skewedLineitem(spark, src, factor)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val dist = spark.read.parquet(s"$out/lineitem.parquet")
      .groupBy("l_returnflag").count().orderBy("l_returnflag").collect()
    val total = dist.map(_.getLong(1)).sum
    println(s"SkewFixture: $out/lineitem.parquet rows=$total " +
      dist.map(r => f"${r.getString(0)}=${r.getLong(1) * 100.0 / total}%.1f%%")
        .mkString(" "))
    spark.stop()
  }
}
