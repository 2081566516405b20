package graft

import org.apache.spark.sql.functions._
import graft.text.Pipeline

/** Behavioral checks for the round-9 curation operators (the DuckDB
  * oracle pins exact values; these pin the SEMANTICS a reader should be
  * able to rely on). */
class CurationOpsSpec extends SparkSpec {

  test("source cap: never keeps more than the cap, keeps whole source when under it") {
    val r = Pipeline.sourceCap(spark, sf("sf0.001")).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (nIn, nKept) = (row.getAs[Long]("n_in"), row.getAs[Long]("n_kept"))
      assert(nKept <= 15L, s"${row.getString(0)} kept $nKept > cap")
      assert(nKept === math.min(nIn, 15L),
        s"${row.getString(0)} kept $nKept of $nIn — cap must bind exactly")
      assert(row.getAs[Long]("chars_kept") <= row.getAs[Long]("chars_in"))
    }
  }

  test("source cap keeps the LONGEST docs: chars_kept maximal for a capped source") {
    import spark.implicits._
    // capped source: chars_kept must equal the sum of the 15 largest docs
    val docs = graft.operators.Tables.t(spark, sf("sf0.001"), "documents")
      .select(col("source"), col("n_chars"))
    val top15 = docs.as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, rows) =>
        s -> rows.map(_._2).sortBy(-_).take(15).sum }
    val r = Pipeline.sourceCap(spark, sf("sf0.001")).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("chars_kept") === top15(row.getString(0)))
    }
  }

  test("dsir select: returns top-k, target-language docs dominate the selection") {
    val r = Pipeline.dsirSelect(spark, sf("sf0.001")).collect()
    assert(r.length === 50)
    // scores are sorted descending with doc_id tiebreak
    val scores = r.map(x => (x.getAs[Long]("dsir_score"), x.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sortBy(x => (-x._1, x._2))))
    // the importance weights target lang='en': en must be over-represented
    // in the top-50 relative to its corpus share (~44%)
    val enFrac = r.count(_.getAs[String]("lang") == "en").toDouble / r.length
    assert(enFrac > 0.6, f"en fraction $enFrac%.2f not dominant — weights inverted?")
  }

  test("chunk overlap: full token coverage, stride layout, bounded sizes") {
    import spark.implicits._
    val chunks = Pipeline.chunkOverlap(spark, sf("sf0.001")).collect()
    assert(chunks.nonEmpty)
    val nToks = graft.operators.Tables.t(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"),
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    chunks.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val n = nToks(doc)
      val sorted = rows.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) === i.toLong, "chunk ids dense from 0")
        assert(r.getAs[Long]("tok_start") === i * 48L, "stride layout")
        assert(r.getAs[Long]("n_chunk_tokens") ===
          math.min(64L, n - i * 48L), "chunk size = min(size, remaining)")
      }
      val last = sorted.last
      assert(last.getAs[Long]("tok_start") + last.getAs[Long]("n_chunk_tokens") === n,
        s"doc $doc: last chunk must end exactly at the token count")
      if (sorted.length > 1)
        assert(sorted.length === ((n - 64 + 47) / 48 + 1),
          s"doc $doc: chunk count formula")
    }
  }

  test("leakage split: every source lands wholly in one split and totals add up") {
    val docs = graft.operators.Tables.t(spark, sf("sf0.001"), "documents")
    val r = Pipeline.leakageSplit(spark, sf("sf0.001")).collect()
    val nSources = docs.select("source").distinct().count()
    val nDocs = docs.count()
    assert(r.map(_.getAs[Long]("n_sources")).sum === nSources,
      "splits must partition the source set (disjoint by construction of the hash)")
    assert(r.map(_.getAs[Long]("n_docs")).sum === nDocs)
  }
}
