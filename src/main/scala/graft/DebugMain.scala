package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Scratch profiling entry point (not part of the library surface). */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val toksCp = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .repartition(32, col("doc_id"))
      .localCheckpoint(true)
    def shingleExpr(tc: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), size(tc) - 2),
        i => concat_ws(" ", element_at(tc, i), element_at(tc, i + 1), element_at(tc, i + 2)))
    time("cp-elementAt")(toksCp.select(explode(shingleExpr(col("toks")))).count())
    val zw = zip_with(zip_with(col("toks"), slice(col("toks"), 2, 1000000),
        (a, b) => concat(a, lit(" "), b)),
      slice(col("toks"), 3, 1000000), (a, b) => concat(a, lit(" "), b))
    time("cp-zipwith")(toksCp.select(explode(slice(zw, lit(1), greatest(size(col("toks")) - 2, lit(1))))).count())
    time("cp-distinct-elementAt")(toksCp.select(explode(array_distinct(shingleExpr(col("toks"))))).count())
    // codegen check
    toksCp.select(explode(shingleExpr(col("toks")))).explain("formatted")
    spark.stop()
  }
}
