package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: the Morton code must be a bijective interleave, and
  * curve-contiguous ranges must bound BOTH dimensions far tighter than
  * a 1-D sort of the same data — the property scan pruning relies on. */
class LayoutSpec extends SparkSpec {

  test("morton16 interleaves bits exactly (scala reference, 200 samples)") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rnd = new scala.util.Random(7)
    val pts = (1 to 200).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(Layout.morton16(col("x"), col("y")).as("z")).as[Long].collect()
    assert(got.toSeq === pts.map { case (x, y) => ref(x, y) })
  }

  test("z-order ranges bound both dimensions; a 1-D sort does not") {
    // deterministic 64x64 grid of points, chunked into 64 ranges of 64
    // rows: under z-order every chunk is an 8x8 box (area 64); under an
    // x-sort every chunk is one column slab spanning all of y (area 64
    // in x=1 strip... times full y extent = 64). The telling metric is
    // the MAX per-dimension extent: z-order bounds both at 8, the 1-D
    // sort leaves y unbounded at 64.
    import spark.implicits._
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = pts.toDF("x", "y")
      .withColumn("z", Layout.morton16(col("x"), col("y")))
    val zChunks = df
      .withColumn("chunk", shiftright(col("z"), 6)) // 64 rows per chunk
      .groupBy("chunk")
      .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
      .agg(max(greatest(col("ex"), col("ey")))).head().getLong(0)
    val xChunks = df
      .withColumn("chunk", floor(col("x") / 1)) // x-sorted 64-row chunks = one x column each
      .groupBy("chunk")
      .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
      .agg(max(greatest(col("ex"), col("ey")))).head().getLong(0)
    assert(zChunks === 7L, s"z-order chunk extent $zChunks, expected 8x8 boxes")
    assert(xChunks === 63L, "the 1-D sort should leave the other dimension unbounded")
  }

  test("skip compare: the layouts trade exactly as the module header claims") {
    // 256-row files: the sf0.001 fixture cuts into ~24 files so the
    // zone maps actually discriminate (the default 4096 gives 2 files)
    val rows = Layout.skipCompare(spark, sf("sf0.001"), rowsPerFile = 256L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("n_scanned"),
          r.getAs[Long]("skip_permille"))).toMap
    assert(rows.size === 6)
    // every (layout, pred) sees the same file count (equal-size cut)
    assert(rows.values.map(_._1).toSet.size === 1)
    // scanned <= files and the permille is consistent
    rows.values.foreach { case (f, s, p) =>
      assert(s <= f); assert(p === 1000L * (f - s) / f)
    }
    // linear: perfect on the prefix dim, blind on the trailing dim
    assert(rows(("linear", "q_user_band"))._3 >=
      rows(("zorder", "q_user_band"))._3)
    assert(rows(("zorder", "q_time_band"))._3 >
      rows(("linear", "q_time_band"))._3)
    // the box never does worse under z-order than the time band alone
    assert(rows(("zorder", "q_box"))._3 >= rows(("zorder", "q_time_band"))._3)
  }
}
