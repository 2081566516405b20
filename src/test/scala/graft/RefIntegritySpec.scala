package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Relational5, Tables}

/** Semantic invariants of the FK orphan audit: a clean star schema
  * reports zero orphans, and PLANTED damage (parent rows dropped,
  * child keys nulled) is counted exactly. */
class RefIntegritySpec extends SparkSpec {

  test("ref integrity: the clean fixture has no orphans and no null keys") {
    val rows = Relational5.dqRefIntegrity(spark, sf("sf0.001")).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") === 0L, r.getAs[String]("fk_edge"))
      assert(r.getAs[Long]("n_null") === 0L, r.getAs[String]("fk_edge"))
      assert(r.getAs[Long]("n_keys") <= r.getAs[Long]("n_rows"))
    }
  }

  test("ref integrity: planted damage is counted exactly") {
    val src = sf("sf0.001")
    val dir = Files.createTempDirectory("refint").toString
    // copy the schema, dropping every supplier with s_suppkey % 5 == 0
    // and nulling l_orderkey on lineitem rows with l_linenumber == 3
    for (t <- Seq("region", "nation", "customer", "part", "orders",
      "events", "documents", "embeddings")) {
      Tables.t(spark, src, t).write.parquet(s"$dir/$t.parquet")
    }
    Tables.t(spark, src, "supplier")
      .filter(col("s_suppkey") % 5 =!= 0)
      .write.parquet(s"$dir/supplier.parquet")
    Tables.t(spark, src, "lineitem")
      .withColumn("l_orderkey",
        when(col("l_linenumber") === 3, lit(null)).otherwise(col("l_orderkey")))
      .write.parquet(s"$dir/lineitem.parquet")

    val got = Relational5.dqRefIntegrity(spark, dir).collect()
      .map(r => r.getAs[String]("fk_edge") ->
        (r.getAs[Long]("n_null"), r.getAs[Long]("n_orphans"))).toMap

    val li = Tables.t(spark, src, "lineitem")
      .select(col("l_suppkey").cast("long"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedNull = li.count(_._2 == 3).toLong
    val expectedOrphans = li.count(_._1 % 5 == 0).toLong
    assert(got("lineitem.l_orderkey->orders") === ((expectedNull, 0L)))
    assert(got("lineitem.l_suppkey->supplier") === ((0L, expectedOrphans)))
    assert(expectedOrphans > 0L && expectedNull > 0L) // damage actually planted
    // undamaged edges stay clean
    assert(got("orders.o_custkey->customer") === ((0L, 0L)))
  }
}
