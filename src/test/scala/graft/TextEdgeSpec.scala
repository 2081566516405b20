package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.functions.Portable

/** Edge cases of the text primitives on synthetic rows (the harness
  * documents table has no empty/degenerate docs, so the guard paths —
  * coalesce on empty folds, greatest(size,1) — need direct coverage). */
class TextEdgeSpec extends SparkSpec {

  test("heavy hitters: every reported token clears the threshold, count bounded by 1000") {
    import org.apache.spark.sql.functions._
    val rows = graft.text.TextAnalysis.heavyHitters(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty && rows.length <= 1000)
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt") > r.getAs[Long]("total") / 1000L)
      assert(r.getAs[Long]("permille") >= 1L)
    }
    // descending-count order with token tiebreak
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts === cnts.sorted.reverse)
  }

  test("tokens of empty / whitespace / punct-only strings are empty") {
    import spark.implicits._
    val df = Seq("", "   ", "?!.,;", "a  b\tc", "ÜPPER Case").toDF("text")
    val out = df.select(TextAnalysis.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out === List(Nil, Nil, Nil, List("a", "b", "c"), List("pper", "case")))
  }

  test("rolling-hash fingerprint of an empty token stream is 0, not null") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "x y z")).toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        coalesce(aggregate(
          zip_with(col("toks"), sequence(lit(1), greatest(size(col("toks")), lit(1))),
            (tk, i) => i.cast("long") * pmod(Portable.hash60(tk), lit(1000003L))),
          lit(0L), (a, v) => a + v), lit(0L)).as("rolling_hash"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === 0L)
    assert(m(2L) !== 0L)
  }

  test("hash60 is non-negative and stable") {
    import spark.implicits._
    val vals = Seq("a", "b", "", "スパーク").toDF("s")
      .select(Portable.hash60(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(vals.forall(_ >= 0L))
    val again = Seq("a", "b", "", "スパーク").toDF("s")
      .select(Portable.hash60(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(vals === again)
  }

  test("trigram construction: <3 tokens yields none; repeats are counted") {
    import spark.implicits._
    // the inline trigram form mirrors TextAnalysis.trigramStats
    val df = Seq((1L, "a b"), (2L, "a b c"), (3L, "x y x y x y x y"))
      .toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("tris", transform(sequence(lit(1), size(col("toks")) - 2),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
      .select(col("doc_id"), size(col("tris")).as("n"),
        size(array_distinct(col("tris"))).as("nd"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(!m.contains(1L))             // 2 tokens → filtered out
    assert(m(2L) === ((1, 1)))          // a b c → one trigram
    assert(m(3L) === ((6, 2)))          // xyx/yxy alternating → 6 total, 2 distinct
  }

  test("split assignment is a total, deterministic 3-way partition") {
    val out = TextAnalysis.splitAssign(spark, sf("sf0.001")).collect()
    assert(out.length === 500)
    val bySplit = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    // hash-uniformity sanity: train ≈ 80% ± wide tolerance
    assert(bySplit("train") > 350 && bySplit("train") < 450, bySplit.toString)
    val again = TextAnalysis.splitAssign(spark, sf("sf0.001")).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("count-min estimates never undercount (CMS invariant)") {
    val rows = TextAnalysis.countMinEstimates(spark, sf("sf0.001")).collect()
    assert(rows.length === 20)
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)),
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).mkString(", "))
  }

  test("quantize rounds half away from zero symmetrically at exact ties") {
    import spark.implicits._
    // floor(x*10000 + 0.5): 0.00005 → 1, -0.00005 → 0 (floor semantics,
    // consistent across engines — that's the portability contract)
    val out = Seq(Array(0.00005f, -0.00005f, 0.12345f)).toDF("v")
      .select(Portable.quantize(col("v")).as("q"))
      .head().getSeq[Long](0).toList
    assert(out.head === 1L || out.head === 0L) // float repr of 0.00005 decides
    assert(out(2) === 1234L || out(2) === 1235L)
    // determinism is the requirement, not a particular tie direction:
    val again = Seq(Array(0.00005f, -0.00005f, 0.12345f)).toDF("v")
      .select(Portable.quantize(col("v")).as("q"))
      .head().getSeq[Long](0).toList
    assert(out === again)
  }

  test("repetition stats: hand-corpus values and lexicographic tie-break") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rep").toString
    Seq(
      (0L, "a b c a b c", "en", "t", 11L), // bigram tie "a b"/"b c"; trigram "a b c" twice
      (1L, "p q r s", "en", "t", 7L),      // no repeated grams
      (2L, "z z", "en", "t", 3L))          // < 3 tokens: excluded
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.repetitionStats(spark, tmp).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val r0 = out(0)
    assert(r0.getString(2) == "a b", "tie must break to the lexicographically smaller gram")
    assert(r0.getLong(3) == 2L)
    assert(r0.getDouble(4) == 1.0)                        // 2*3 over total_chars 6
    assert(math.abs(r0.getDouble(5) - 10.0 / 6) < 1e-12)  // "a b c" x2: 2*5 over 6 (> 1 by design)
    val r1 = out(1)
    assert(r1.getLong(3) == 1L && r1.getDouble(5) == 0.0)
  }

  test("repetition stats agree with trigramStats on which docs repeat") {
    val dir = sf("sf0.001")
    val rep = TextAnalysis.repetitionStats(spark, dir)
      .select(col("doc_id"), (col("dup_trigram_char_frac") > 0d).as("dup"))
    val tri = TextAnalysis.trigramStats(spark, dir)
      .select(col("doc_id"), (col("dup_trigram_ratio") > 0d).as("dup"))
    assert(rep.exceptAll(tri).isEmpty && tri.exceptAll(rep).isEmpty)
  }
}
