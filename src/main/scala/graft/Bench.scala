package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full execution through the noop sink
  * (count() would let Catalyst prune the compute), and prints one JSON
  * line: {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Untimed warmup: a cheap slice of the surface (scan, decimal agg,
    // window, text map) so the alphabetically-first timed query doesn't
    // absorb session-wide codegen/JIT cost (measured: ~6 s swing on the
    // first query). Skipped under SPARK_GRAFT_ONLY (single-query
    // iteration must not run unrelated work). The 4 warmup queries are
    // themselves re-timed warm — a small conservative bias on 4
    // sub-second queries. Methodology documented in BASELINE.md.
    if (only.isEmpty)
      for (n <- Seq("s11_full_scan_count", "q1_pricing_summary",
                    "window_topk_per_group", "text_token_counts",
                    "sim_lsh_signatures"); // codegen-heaviest family
           fn <- SparkEntry.queries.get(n))
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
    val failed = Seq.newBuilder[String]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val failures = failed.result()
    val failedJson = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
