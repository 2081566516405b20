package graft

/** SQL-function registration of the custom codegen expression: the
  * extensibility surface the reference lacks (SURVEY.md §2.4). */
class ExtensionsSpec extends SparkSpec {

  test("array_dot_long is callable from SQL after register()") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT array_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(r === 32L)
    // null propagation
    val n = spark.sql(
      "SELECT array_dot_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d").head()
    assert(n.isNullAt(0))
    // works over real data: self dot product positive for each embedding
    val cnt = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .createOrReplaceTempView("emb_ext")
    val bad = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT array_dot_long(
        |    transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT)),
        |    transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT))) AS d
        |  FROM emb_ext
        |) WHERE d <= 0""".stripMargin).head().getLong(0)
    assert(bad === 0L)
  }
}
