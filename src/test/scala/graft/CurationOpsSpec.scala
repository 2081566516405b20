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

  test("span corruption: masks replay from a serial walk; islands merge overlaps") {
    val dir = sf("sf0.001")
    val got = graft.text.Pipeline.spanCorruption(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("mask_permille")))).toMap
    def h(doc: Long, j: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"span_${doc}_$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val docs = operators.Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)))
      .filter(_._2 > 0)
    val want = docs.map { case (id, n) =>
      val masked = (0L until n.toLong).map { i =>
        (math.max(0L, i - 2) to i).exists { j =>
          h(id, j) % 100 < 10 && (j + 1 + (h(id, j) * 7 + 13) % 3) > i
        }
      }
      val spans = masked.foldLeft((0L, false)) { case ((c, prev), m) =>
        (if (m && !prev) c + 1 else c, m)
      }._1
      val nm = masked.count(identity).toLong
      id -> ((n.toLong, nm, spans, 1000 * nm / n))
    }.toMap
    assert(got === want)
    // corruption rate lands in the engineered band on the real corpus
    val (tot, msk) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    assert(msk * 1000 / tot >= 100 && msk * 1000 / tot <= 250, s"rate=${msk * 1000 / tot}")
  }

  test("fim split: reordering is a permutation (fim docs reorder, rest identical)") {
    val dir = sf("sf0.001")
    val got = graft.text.Pipeline.fimSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getAs[Long]("cut_a"),
        r.getAs[Long]("cut_b"), r.getString(4)))
    val text = operators.Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.exists(_._2) && got.exists(!_._2)) // both modes present
    got.foreach { case (id, fim, a, b, m) =>
      val t = text(id)
      if (fim) {
        assert(1 <= a && a <= b && b <= t.length)
        val re = t.substring(b.toInt) + t.substring(0, a.toInt) + t.substring(a.toInt, b.toInt)
        assert(re.length === t.length) // permutation, nothing lost
        assert(m === md5hex(re))
      } else assert(a === 0L && b === 0L && m === md5hex(t))
    }
  }

  test("dataset card: every metric replays serially and the splits partition the corpus") {
    val dir = sf("sf0.001")
    val got = graft.text.Pipeline.datasetCard(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = operators.Tables.t(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got("n_docs") === docs.length.toLong)
    assert(got("n_chars") === docs.map(_._2.length.toLong).sum)
    assert(got("n_tokens") === docs.map(_._2.toLowerCase
      .split("[^a-z0-9]+").count(_.nonEmpty).toLong).sum)
    assert(got("n_langs") === docs.map(_._3).distinct.length.toLong)
    assert(got("n_sources") === docs.map(_._4).distinct.length.toLong)
    assert(got("n_exact_dups") === docs.length.toLong - docs.map(_._2).distinct.length)
    assert(got("split_train") + got("split_val") + got("split_test") === got("n_docs"))
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

  test("shard manifest: conserves totals and the XOR checksums replay") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val got = Pipeline.shardManifest(spark, dir).collect()
      .map(r => (r.getAs[Long]("shard"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("xor_checksum")))).toMap
    val docs = graft.operators.Tables.t(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val want = docs.groupBy(d => h60(s"shard_${d._1}") % 64L).map { case (s, ds) =>
      s -> ((ds.length.toLong, ds.map(_._2).sum,
        ds.map(d => h60(d._3)).reduce(_ ^ _)))
    }
    assert(got === want)
    assert(got.values.map(_._1).sum === docs.length.toLong)
  }
}
