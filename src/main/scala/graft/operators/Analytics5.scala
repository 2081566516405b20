package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Cache.CacheOps
import graft.sim.GraphOps

/** Round-12 analytics additions — community detection over the shared
  * part↔supplier co-occurrence graph (graft.sim.GraphOps.edges; cf.
  * reference kernel.cu:41's key universe for provenance of the id
  * space — the graph surface itself is north-star scope, absent from
  * the reference).
  */
object Analytics5 {

  private val lpaRounds = 4

  /** Label encoding bound for the argmax-by-(count, min-label) trick:
    * score = c·K − label packs the vote count and the tie-break into
    * one BIGINT so the per-node winner is a plain `max`. Requires
    * K > max node id (node ids here are ≤ ~1.3e10 even on the 64×
    * fixture; K = 1e12 leaves c ≤ ~1e6 before BIGINT range matters).
    * A key universe beyond K would switch to `max(struct(c, -label))`
    * — same single-agg shape, engine-native ordering. */
  private val ScoreK = 1000000000000L

  /** Synchronous label propagation (Raghavan 2007) — community
    * detection next to the CC/modularity family: each round every node
    * adopts the most frequent label among its neighbors AND itself
    * (the self-vote is the standard damping for the oscillation a
    * bipartite graph induces under synchronous update), ties broken
    * toward the smaller label, so the fixed round count is exactly
    * reproducible — the DuckDB oracle unrolls the same rounds.
    *
    * Scale shape (the LPA that survives 100 TB): per round ONE
    * edge⋈labels equi-join, a (node, label) count agg, and a per-node
    * max — all partial-aggregable BIGINT shuffles keyed on node; no
    * per-round frame ever exceeds |E|. Lineage is cut per round
    * ([[graft.Cache.CacheOps.cutRound]]) like the CC iterations.
    * Output is the community-size histogram (label identities are
    * fixture node ids — sizes are the portable signal). */
  def labelPropagation(spark: SparkSession, dir: String,
                       rounds: Int = lpaRounds): DataFrame = {
    val e = GraphOps.edges(spark, dir).staged // reused every round
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      val prop = e.join(labels, e("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      labels = labels.select("node", "label").unionAll(prop)
        .groupBy("node", "label").agg(count(lit(1)).as("c"))
        .select(col("node"), (col("c") * ScoreK - col("label")).as("score"))
        .groupBy("node").agg(max("score").as("m"))
        .select(col("node"),
          expr(s"((m + ${ScoreK - 1}L) DIV ${ScoreK}L) * ${ScoreK}L - m").as("label"))
        .cutRound // per-round drain cut
    }
    labels.groupBy("label").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_communities"))
      .orderBy("csize")
  }

  def labelPropagationSql(rounds: Int = lpaRounds): String = {
    val iters = (1 to rounds).map { i =>
      s"""l$i AS (
         |  SELECT node, ((m + ${ScoreK - 1}) // $ScoreK) * $ScoreK - m AS label FROM (
         |    SELECT node, max(c * $ScoreK - label) AS m FROM (
         |      SELECT node, label, count(*) AS c FROM (
         |        SELECT node, label FROM l${i - 1}
         |        UNION ALL
         |        SELECT e.dst AS node, l.label
         |        FROM edges e JOIN l${i - 1} l ON e.src = l.node
         |      ) GROUP BY node, label
         |    ) GROUP BY node
         |  )
         |)"""
    }.mkString(",\n")
    s"""WITH ${GraphOps.edgesSql},
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |$iters,
       |comm AS (SELECT label, count(*) AS csize FROM l$rounds GROUP BY label)
       |SELECT csize, count(*) AS n_communities FROM comm
       |GROUP BY csize ORDER BY csize""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_label_prop" -> ((s, d) => labelPropagation(s, d)))

  val oracles: Map[String, String] = Map(
    "graph_label_prop" -> labelPropagationSql())
}
