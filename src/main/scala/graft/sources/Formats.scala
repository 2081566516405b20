package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format surface. The reference has no file formats at all
  * (in-memory only, stdout output — SURVEY.md §2.4); a complete Spark
  * engine exposes the standard lake formats. Parquet is the primary
  * (used by every harness query); CSV and JSON(L) round-trips are
  * covered here, plus partitioned-parquet writes with partition pruning
  * on read — the layout that matters at 100 TB (prune to a partition
  * directory before any I/O).
  */
object Formats {

  /** Write df in the given format and read it back (schema preserved via
    * explicit schema on text formats). */
  def roundTrip(spark: SparkSession, df: DataFrame, path: String,
                format: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).format(format)
      .option("header", "true").save(path)
    spark.read.format(format)
      .option("header", "true").schema(df.schema).load(path)
  }

  /** Partitioned parquet write (by a low-cardinality column) + pruned
    * read — returns the pruned frame; callers assert the scan shows
    * partition filters. */
  def partitionedWrite(spark: SparkSession, df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  def prunedRead(spark: SparkSession, path: String, partitionCol: String,
                 value: String): DataFrame =
    spark.read.parquet(path).filter(col(partitionCol) === value)
}
