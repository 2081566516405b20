package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-mitigation operators: salting patterns for hot keys.
  *
  * `l_returnflag` has 3 values over 600k+ rows — the textbook skewed
  * aggregation. Two-stage salted aggregation spreads each hot key over
  * SALT buckets for the partial agg (parallel), then combines the
  * partials (3×SALT rows) in a trivially small final agg. The result is
  * bit-identical to the direct aggregation because sums over DECIMAL are
  * associative+commutative — which is also what the DuckDB oracle
  * asserts. Same pattern applies to skewed joins (salt the hot side,
  * replicate the other); AQE's skew-join handles the join case
  * automatically at runtime.
  */
object Skew {
  import Tables.t

  private val SALT = 16

  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast(DecimalType(18, 2)).as("qty"),
        // deterministic salt from a line-unique key (NOT rand(): results
        // must be reproducible across retries/partitionings)
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(SALT.toLong)).as("salt"))
      .groupBy("l_returnflag", "salt")                // stage 1: spread hot keys
      .agg(sum("qty").as("partial_qty"), count(lit(1)).as("partial_n"))
      .groupBy("l_returnflag")                        // stage 2: tiny combine
      .agg(sum("partial_qty").cast("double").as("sum_qty"),
        sum("partial_n").as("n_rows"))
      .orderBy("l_returnflag")

  /** Oracle = the UNSALTED aggregation: proves the salted two-stage
    * plan computes the identical result. */
  val saltedAggSql: String =
    """SELECT l_returnflag,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_salted_skew" -> saltedAgg)
  val oracles: Map[String, String] = Map(
    "agg_salted_skew" -> saltedAggSql)
}
