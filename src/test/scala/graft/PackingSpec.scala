package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.{Pipeline, TextAnalysis}
import graft.operators.Tables.t

/** Sequence packing and mixture resampling invariants (the properties
  * the oracle's hash equality can't state directly).
  */
class PackingSpec extends SparkSpec {

  private lazy val dir = sf("sf0.001")

  test("length buckets: power-of-two ranges, conservation, and bucketing strictly cuts padding") {
    val rows = Pipeline.lengthBuckets(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, maxLen) = (r.getAs[Long]("bucket"), r.getAs[Long]("max_len"))
      assert(maxLen >= (1L << b) && maxLen < (1L << (b + 1)),
        s"bucket $b max_len $maxLen outside [2^$b, 2^${b + 1})")
      assert(r.getAs[Long]("pad_bucketed") >= 0L)
      assert(r.getAs[Long]("pad_global") >= r.getAs[Long]("pad_bucketed"))
    }
    // conservation: bucket token masses sum to the corpus token count
    val total = t(spark, dir, "documents")
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") >= 1).agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === total)
    // the report's reason to exist: bucketing beats global padding
    assert(rows.map(_.getAs[Long]("pad_bucketed")).sum <
      rows.map(_.getAs[Long]("pad_global")).sum)
  }

  test("packing conserves documents and tokens exactly") {
    val docs = t(spark, dir, "documents")
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .agg(count(lit(1)).as("d"), sum("n_tok").as("tk")).head()
    val packed = Pipeline.packSequences(spark, dir)
      .agg(sum("n_docs").as("d"), sum("n_tokens").as("tk")).head()
    assert(packed.getLong(0) == docs.getLong(0))
    assert(packed.getLong(1) == docs.getLong(1))
  }

  test("per-shard chunk ids are contiguous from 0") {
    val rows = Pipeline.packSequences(spark, dir)
      .groupBy("shard")
      .agg(min("chunk_id").as("lo"), max("chunk_id").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L, s"shard ${r.get(0)} min chunk ${r.getLong(1)}")
      assert(r.getLong(3) == r.getLong(2) + 1,
        s"shard ${r.get(0)} has gaps: hi=${r.getLong(2)} n=${r.getLong(3)}")
    }
  }

  test("chunk token sums respect the budget up to one straddling document") {
    // A chunk's docs all START inside it, so its token sum is < budget
    // + the last doc's length; with budget 512 and fixture docs far
    // smaller, every non-final chunk per shard lands within 2x budget.
    val over = Pipeline.packSequences(spark, dir)
      .filter(col("n_tokens") > Pipeline.PackBudget * 2).count()
    assert(over == 0L)
  }

  private lazy val resample: Array[org.apache.spark.sql.Row] =
    Pipeline.mixResample(spark, dir)
      .select("lang", "docs_in", "tokens_in", "repl_permille", "docs_out", "tokens_out")
      .collect()

  test("the largest language resamples at exact parity (r = 1000, identity)") {
    val top = resample.maxBy(_.getLong(2))
    assert(top.getLong(3) == 1000L)
    assert(top.getLong(4) == top.getLong(1), "parity lang must be unchanged")
    assert(top.getLong(5) == top.getLong(2))
  }

  test("every language upsamples within [1x, 4x] and k matches r bounds") {
    resample.foreach { r =>
      val (dIn, rp, dOut) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(rp >= 1000L && rp <= 4000L, s"${r.getString(0)} r=$rp")
      assert(dOut >= dIn * (rp / 1000), s"${r.getString(0)} under floor")
      assert(dOut <= dIn * (rp / 1000 + 1), s"${r.getString(0)} over ceil")
    }
  }

  test("resampling is a pure function of ids: two runs are identical") {
    val a = Pipeline.mixResample(spark, dir)
    val b = Pipeline.mixResample(spark, dir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("packing is a single shuffle: one Exchange, window and agg share it") {
    val p = planString(Pipeline.packSequences(spark, dir))
    // count detail-section headers only — each node also appears once
    // in the printed tree
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 1, p.take(2000))
  }

  test("resampling broadcasts the ratio table onto the corpus") {
    val p = planString(Pipeline.mixResample(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("global shuffle: conservation, balance, and the exact permutation checksum") {
    val rows = Pipeline.globalShuffle(spark, dir).collect()
    val nDocs = t(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(rows.forall(r => r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 8))
    // uniform keys → no shard may dominate (loose 3x-mean bound)
    val max = rows.map(_.getAs[Long]("n_docs")).max
    assert(max <= 3 * nDocs / rows.length,
      s"shard imbalance: max=$max over ${rows.length} shards of $nDocs docs")
    // reconstruct the permutation independently in plain Scala (same md5
    // convention as Portable.hash60) and tie out every shard checksum
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    val ids = t(spark, dir, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    val width = (1L << 60) / 8
    val expected = ids.map(id => (h60(s"shuf42_$id"), id))
      .groupBy { case (k, _) => k / width }
      .view.mapValues { g =>
        g.sortBy(identity).zipWithIndex
          .map { case ((_, id), i) => h60(s"${i + 1}_$id") }
          .reduce(_ ^ _)
      }.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("order_checksum") === expected(r.getAs[Long]("shard")),
        s"permutation checksum mismatch in shard ${r.getAs[Long]("shard")}")
    }
  }

  test("global shuffle is partitioning-independent (no sampling pass)") {
    val a = Pipeline.globalShuffle(spark, dir).collect().map(_.toSeq)
    val b = Pipeline.globalShuffle(spark, dir).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // the corpus-sized exchange must be the window's hash partitioning on
    // the computed shard id — fixed-bound ranges need no sampling pass.
    // (the only rangepartitioning allowed is the 8-row presentation sort)
    val plan = Pipeline.globalShuffle(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"),
      "corpus exchange must hash-partition on the computed shard id")
    assert("rangepartitioning".r.findAllIn(plan).size <= 1,
      "global shuffle must use fixed-bound shards, not sampled range partitioning")
  }
}
