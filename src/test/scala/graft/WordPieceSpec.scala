package graft

import org.apache.spark.sql.functions._
import graft.text.WordPiece

/** Greedy WordPiece semantics pinned by hand: longest-match-first,
  * role-tagged (## continuation) lookup, whole-word UNK. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  /** Run the greedy fold over one word under an explicit vocab. */
  private def seg(w: String, vocab: Seq[String]): (Long, Long) = {
    val vm = map_from_entries(array(
      vocab.map(p => struct(lit(p), lit(1L))): _*))
    val r = Seq(w).toDF("w").withColumn("vm", vm)
      .select(WordPiece.greedySeg.as("g"))
      .select(col("g.n_tok"), col("g.n_unk")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("the canonical BERT example: un ##aff ##able") {
    // classic WordPiece segmentation from the BERT README
    assert(seg("unaffable",
      Seq("un", "##aff", "##able", "##a", "##f", "##b", "##l", "##e", "u", "##n"))
      === (3L, 0L))
  }

  test("longest-match-first beats alternative segmentations") {
    // both {a,##bc} (2 pieces) and {ab,##c} (2 pieces) cover "abc", but
    // greedy MUST start with the longest initial match "ab" — drop
    // "##c" from the vocab and greedy FAILS even though {a,##bc} would
    // have covered the word (the documented non-optimality of greedy)
    assert(seg("abc", Seq("ab", "##c", "a", "##bc")) === (2L, 0L))
    assert(seg("abc", Seq("ab", "a", "##bc")) === (1L, 1L), "greedy is not Viterbi")
  }

  test("role tagging: an initial-only piece never matches mid-word") {
    // "aa": initial 'a' matches position 1, but position 2 needs the
    // CONTINUATION piece '##a' — raw 'a' must not match there
    assert(seg("aa", Seq("a")) === (1L, 1L))
    assert(seg("aa", Seq("a", "##a")) === (2L, 0L))
  }

  test("whole-word UNK: one token, word granularity") {
    assert(seg("xyz", Seq("x", "##y")) === (1L, 1L), "missing ##z fails the WORD")
    assert(seg("x", Seq("##x")) === (1L, 1L), "continuation-only can't start a word")
  }

  test("empty word short-circuits to (0, 0) instead of a sequence-boundary error") {
    // unreachable via TextAnalysis.tokens, but the Column is
    // private[graft]-reusable and must not throw on the edge
    assert(seg("", Seq("a")) === (0L, 0L))
  }

  test("harness fixture: real nonzero UNK and sane fertility at sf0.001") {
    val rows = WordPiece.wordpieceEncode(spark, sf("sf0.001")).collect()
    val total = rows.find(_.getLong(0) == -1L).get
    val (n, t, u) = (total.getLong(1), total.getLong(2), total.getLong(3))
    assert(u > 0L, "vocab cap must produce real UNK mass")
    assert(u < n / 2, s"UNK mass $u of $n words — vocab too small to be meaningful")
    assert(t >= n, "every word is at least one token")
    // per-doc rows sum to the rollup row
    val docs = rows.filter(_.getLong(0) >= 0L)
    assert(docs.map(_.getLong(2)).sum === t)
    assert(docs.map(_.getLong(3)).sum === u)
  }

  test("vocab artifact: size-capped, count-descending, role-tagged") {
    val v = WordPiece.wordpieceVocab(spark, sf("sf0.001")).collect()
    assert(v.length === WordPiece.vocabK)
    val cnts = v.map(_.getLong(1)).toSeq
    assert(cnts === cnts.sortBy(-_), "vocab not count-descending")
    assert(v.exists(_.getString(0).startsWith("##")), "no continuation pieces")
    assert(v.exists(!_.getString(0).startsWith("##")), "no initial pieces")
  }
}

/** The bake-off report must tie out against the families it restates. */
class TokenizerCompareSpec extends SparkSpec {
  test("every arm's row equals its family's own rollup row") {
    val dir = sf("sf0.001")
    val rep = graft.text.TokenizerCompare.tokenizerCompare(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rep.keySet === Set("chars", "bpe", "bytebpe", "unigram", "wordpiece"))
    val nWords = rep("chars")._1
    assert(rep.values.forall(_._1 == nWords), "denominator differs across rows")
    // chars row: Σ word lengths, zero UNK
    import org.apache.spark.sql.functions._
    val base = graft.operators.Tables.t(spark, dir, "documents")
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("w"))
      .agg(count(lit(1)), sum(length(col("w")).cast("long"))).head()
    assert((rep("chars")._1, rep("chars")._2) === (base.getLong(0), base.getLong(1)))
    assert(rep("chars")._3 === 0L)
    // wordpiece row == the family's own corpus rollup
    val wp = graft.text.WordPiece.wordpieceEncode(spark, dir).collect()
      .find(_.getLong(0) == -1L).get
    assert((rep("wordpiece")._2, rep("wordpiece")._3) === (wp.getLong(2), wp.getLong(3)))
    // unigram row == the family's own corpus rollup
    val un = graft.text.Unigram.unigramEncode(spark, dir).collect()
      .find(_.getLong(0) == -1L).get
    assert((rep("unigram")._2, rep("unigram")._3) === (un.getLong(2), un.getLong(3)))
    // bytebpe row == the family's own corpus rollup; UNK structurally 0
    val bb = graft.text.ByteBpe.byteBpeEncode(spark, dir).collect()
      .find(_.getLong(0) == -1L).get
    assert((rep("bytebpe")._2, rep("bytebpe")._3) ===
      (bb.getAs[Long]("n_bytebpe_tokens"), 0L))
    // fertility is the stated integer formula
    rep.values.foreach { case (w, t, _, f) => assert(f === 1000L * t / w) }
  }
}
