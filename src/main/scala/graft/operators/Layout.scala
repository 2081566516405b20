package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Tables.t

/** Data-layout operators: Z-order (Morton-curve) clustering — the
  * multi-dimensional sort that makes file/row-group statistics
  * selective on MORE THAN ONE column (the Delta/Iceberg `OPTIMIZE
  * ZORDER BY` technique).
  *
  * A linear sort on (a, b) gives perfect skipping on `a` and none on
  * `b`; interleaving the bits of both dimensions into one Morton code
  * and sorting by it keeps ranges of the sorted file CLUSTERED in both
  * dimensions at once — every consecutive chunk covers a bounded
  * rectangle of (a, b) space, so min/max stats prune 2-D predicates.
  * At 100 TB this is a WRITE-TIME layout choice: one extra projection
  * and the same sort-based write path, paid once, skipping forever.
  *
  * The Morton code is pure bit arithmetic (16 bits per dimension →
  * 32-bit code), exactly reproducible in the DuckDB oracle.
  */
object Layout {

  private val dimBits = 16

  /** Bit-interleave two 16-bit grid coordinates into a Morton code:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. A plain
    * 32-term integer expression — whole-stage-codegen'd, no UDF. */
  def morton16(x: Column, y: Column): Column =
    (0 until dimBits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)): Column
    }.reduce(_ + _)

  private def mortonSql(x: String, y: String): String =
    (0 until dimBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Z-range clustering statistics over events laid out on the
    * (user_id, event-hour) Morton curve: rows are assigned to
    * consecutive ranges of the curve (the file/row-group analog) and
    * each range reports its 2-D bounding box. The demonstrable layout
    * property — each range's box is TIGHT in both dimensions — is what
    * a scan planner exploits to prune 2-D predicates; LayoutSpec
    * asserts it quantitatively against a 1-D sort of the same data.
    *
    * Plan: one map stage for grid/Morton columns, one shuffle for the
    * per-range aggregate. */
  def zorderStats(spark: SparkSession, dir: String, rangeShift: Int = 18): DataFrame =
    t(spark, dir, "events")
      .select(
        col("user_id").bitwiseAND(lit(65535L)).as("ux"),
        expr("(ts div 3600000000000) & 65535").as("th"))
      .withColumn("zr", shiftright(morton16(col("ux"), col("th")), rangeShift))
      .groupBy("zr")
      .agg(count(lit(1)).as("n_rows"),
        min("ux").as("min_u"), max("ux").as("max_u"),
        min("th").as("min_t"), max("th").as("max_t"))
      .withColumn("bbox_area",
        (col("max_u") - col("min_u") + 1) * (col("max_t") - col("min_t") + 1))
      .orderBy("zr")

  def zorderStatsSql(rangeShift: Int = 18): String =
    s"""WITH g AS (
       |  SELECT user_id & 65535 AS ux,
       |         (epoch_ns(ts) // 3600000000000) & 65535 AS th
       |  FROM events
       |), z AS (
       |  SELECT ux, th, (${mortonSql("ux", "th")}) >> $rangeShift AS zr FROM g
       |)
       |SELECT zr, count(*) AS n_rows,
       |       min(ux) AS min_u, max(ux) AS max_u,
       |       min(th) AS min_t, max(th) AS max_t,
       |       (max(ux) - min(ux) + 1) * (max(th) - min(th) + 1) AS bbox_area
       |FROM z GROUP BY zr ORDER BY zr""".stripMargin

  /** Small-file compaction planning — the other half of table
    * maintenance next to Z-order: assign the table's file inventory
    * (modeled here as the per-(source, lang) cells of the documents
    * table, sized by their character bytes) to target-sized compaction
    * bins. The assignment is CUMULATIVE-FILL packing: files in a fixed
    * total order, bin = floor(bytes-before / target) — deterministic,
    * partitioning-independent, and what sorted-boundary OPTIMIZE
    * implementations actually do (greedy first-fit is inherently
    * serial and non-deterministic under reordering).
    *
    * The global window runs over the FILE INVENTORY — metadata whose
    * cardinality is the file count, not the data size — which is the
    * one place a global ordered window is the honest plan at 100 TB
    * (a planner node would hold the same list). */
  def compactionBins(spark: SparkSession, dir: String,
                     targetBytes: Long = 65536): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = t(spark, dir, "documents")
      .groupBy("source", "lang")
      .agg(sum(col("n_chars")).as("file_bytes"), count(lit(1)).as("n_docs"))
    val w = Window.orderBy("source", "lang")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum("file_bytes").over(w), lit(0L)))
      .select(col("source"), col("lang"), col("n_docs"), col("file_bytes"),
        expr(s"cum_before DIV $targetBytes").as("bin"))
      .orderBy("source", "lang")
  }

  def compactionBinsSql(targetBytes: Long = 65536): String =
    s"""WITH files AS (
       |  SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS file_bytes,
       |         count(*) AS n_docs
       |  FROM documents GROUP BY source, lang
       |), packed AS (
       |  SELECT source, lang, n_docs, file_bytes,
       |         coalesce(sum(file_bytes) OVER (ORDER BY source, lang
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM files
       |)
       |SELECT source, lang, n_docs, file_bytes,
       |       CAST(cum_before // $targetBytes AS BIGINT) AS bin
       |FROM packed ORDER BY source, lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder_stats" -> ((s, d) => zorderStats(s, d)),
    "layout_compaction_bins" -> ((s, d) => compactionBins(s, d)))

  val oracles: Map[String, String] = Map(
    "layout_zorder_stats" -> zorderStatsSql(),
    "layout_compaction_bins" -> compactionBinsSql())
}
