package graft.text

import org.apache.spark.sql.SparkSession

/** Session-scoped memo of trained tokenizer state (BPE merge tables,
  * byte-BPE forms, the unigram-LM model, the WordPiece vocab), keyed by
  * an explicit caller-provided string — `"<dir>|<family>|<split>"` from
  * the dir-aware query entry points.
  *
  * Train-once-encode-many is the real tokenizer pipeline shape: a
  * release trains one artifact and every consumer (per-doc counts,
  * fertility, encode, held-out encode, the bake-off report) applies it.
  * The board's tokenizer families re-paid the full 6-round merge loop /
  * hard-EM loop per query (~0.5–1 s each across 8+ queries at sf0.1);
  * this memo makes them share it, mirroring the established
  * [[graft.sim.Clustering]] / [[graft.sim.Pq]] / [[graft.sim.NnDescent]]
  * train memos. Bench evicts between timing passes so every pass
  * re-pays training; spec hand-corpora pass no key and stay unmemoized.
  */
private[graft] object TrainMemo {
  private val cache =
    new java.util.HashMap[SparkSession, Map[String, AnyRef]]

  /** Drop this session's memoized trainings (Bench, between passes). */
  private[graft] def evict(spark: SparkSession): Unit =
    cache.synchronized { cache.remove(spark); () }

  /** Memoize `build` under `key` (None = no memoization). */
  private[text] def memo[T <: AnyRef](spark: SparkSession,
                                      key: Option[String])(build: => T): T =
    key match {
      case None => build
      case Some(k) =>
        cache.synchronized {
          cache.keySet.removeIf(s => s.sparkContext.isStopped)
          val per = cache.getOrDefault(spark, Map.empty)
          per.get(k) match {
            case Some(v) => v.asInstanceOf[T]
            case None =>
              val v = build
              cache.put(spark,
                cache.getOrDefault(spark, Map.empty) + (k -> v))
              v
          }
        }
    }
}
