package graft

import org.apache.spark.sql.functions._
import graft.operators.Tables

/** Map-typed column surface (no DuckDB oracle: MAP extraction semantics
  * differ across engines, so the coverage lives here as specs). */
class MapFuncSpec extends SparkSpec {

  test("map build / lookup / keys / values / concat") {
    import spark.implicits._
    val df = Seq((1, "a", 10), (1, "b", 20), (2, "c", 30)).toDF("id", "k", "v")
    val m = df.groupBy("id")
      .agg(map_from_entries(sort_array(collect_list(struct(col("k"), col("v"))))).as("m"))
    val rows = m.select(col("id"),
        map_keys(col("m")).as("ks"),
        map_values(col("m")).as("vs"),
        element_at(col("m"), "a").as("a_val"),
        size(col("m")).as("n"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[String](1) === Seq("a", "b"))
    assert(rows(0).getSeq[Int](2) === Seq(10, 20))
    assert(rows(0).getInt(3) === 10)
    assert(rows(1).isNullAt(3)) // key absent → NULL
    assert(rows(0).getInt(4) === 2 && rows(1).getInt(4) === 1)
  }

  test("token frequency as a map column over real documents") {
    val tf = Tables.t(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id")
      .agg(map_from_entries(sort_array(collect_list(struct(col("tok"), col("count"))))).as("tf"))
    val r = tf.select(col("doc_id"), size(col("tf")).as("n_distinct"),
        element_at(col("tf"), "the").as("the_count"))
      .orderBy("doc_id").limit(5).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getInt(1) > 0))
  }
}
