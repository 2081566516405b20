package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, Unigram}

/** Unigram-LM tokenizer semantics: Viterbi segmentation on a hand
  * corpus, real UNK accounting, partitioning-independence, and the
  * fertility comparison against the BPE family. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("hand corpus: Viterbi picks the max-probability segmentation") {
    // "abab" dominates, so pieces 'abab'/'aba'/'bab'/'ab'... all seed.
    // After EM, frequent multi-char pieces out-score char chains, and
    // every form re-segments to its own full form when in vocab.
    val docs = Seq(
      (0L, "abab abab abab abab abab abab"),
      (1L, "abab abab abab cd cd cd"),
      (2L, "cd cd abab")).toDF("doc_id", "text")
    val out = Unigram.encodeAcross(docs, docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 'abab' (10 occurrences) and 'cd' (6) both make the vocabulary:
    // every word is one token, nothing is UNK
    assert(out(0L) === ((6L, 6L, 0L)), s"doc0: ${out(0L)}")
    assert(out(1L) === ((6L, 6L, 0L)), s"doc1: ${out(1L)}")
    assert(out(2L) === ((3L, 3L, 0L)), s"doc2: ${out(2L)}")
    assert(out(-1L) === ((15L, 15L, 0L)), s"total: ${out(-1L)}")
  }

  test("hand corpus: rare pieces fall to UNK character fallback") {
    // 34 distinct single-char forms (letters+digits minus z/q) at count
    // 3 crowd the pruneK=32 vocabulary — the (cnt desc, piece asc)
    // tie-break keeps the 32 lexicographically-first, so at least two
    // chars AND the count-1 'z'/'q' fall below the cut. The lone 'zq'
    // form then has no covering piece and emits UNK characters.
    val filler = (('a' to 'y').filterNot(_ == 'q') ++ ('0' to '9')).map(_.toString)
    val docs = Seq(
      (0L, Seq.fill(3)(filler).flatten.mkString(" ")),
      (1L, "zq")).toDF("doc_id", "text")
    val row = Unigram.encodeAcross(docs, docs)
      .filter(col("doc_id") === 1L).collect().head
    assert(row.getLong(1) === 1L)
    assert(row.getLong(3) > 0L, s"no UNK emitted for the starved form: $row")
  }

  test("harness fixture: encode emits real nonzero UNK at sf0.001") {
    val total = Unigram.unigramEncode(spark, sf("sf0.001"))
      .filter(col("doc_id") === -1L).collect().head
    assert(total.getLong(3) > 0L,
      s"UNK structurally zero on the fixture — pruneK no longer bites: $total")
    // UNK is the exception, not the rule
    assert(total.getLong(3) < total.getLong(2) / 10L,
      s"UNK mass implausibly high: $total")
  }

  test("training is partitioning-independent") {
    val docs = graft.operators.Tables.t(spark, sf("sf0.001"), "documents")
    val a = Unigram.encodeAcross(docs, docs).collect().toSeq
    val b = Unigram.encodeAcross(docs.repartition(13, col("doc_id")), docs)
      .collect().toSeq
    assert(a === b, "model depends on input partitioning")
  }

  test("fertility: unigram compresses at least as well as characters, " +
    "and within 2x of BPE on the fixture") {
    val dir = sf("sf0.001")
    val uni = Unigram.unigramEncode(spark, dir)
      .filter(col("doc_id") === -1L).collect().head
    val uniFert = uni.getLong(2).toDouble / uni.getLong(1)
    val bpe = Bpe.bpeCounts(spark, dir)
      .agg(sum("n_words"), sum("n_chars"), sum("n_bpe_tokens")).collect().head
    val bpeFert = bpe.getLong(2).toDouble / bpe.getLong(0)
    val charFert = bpe.getLong(1).toDouble / bpe.getLong(0)
    assert(uniFert >= 1.0, s"fewer tokens than words: $uniFert")
    assert(uniFert < charFert,
      s"unigram no better than character splitting: $uniFert vs $charFert")
    // the two learned tokenizers should land in the same regime — a 2x
    // gap would mean one of them degenerated on the shared corpus
    assert(uniFert < 2.0 * bpeFert && bpeFert < 2.0 * uniFert,
      s"tokenizer families diverged: unigram $uniFert vs bpe $bpeFert")
  }
}
