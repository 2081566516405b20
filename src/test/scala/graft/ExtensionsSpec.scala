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

  test("nfc_normalize is callable from SQL and implements Unicode NFC") {
    graft.plans.GraftExtensions.register(spark)
    val decomposed = "a\u0301b" // 'a' + combining acute + 'b' (3 code points)
    val composed = "\u00e1b"    // precomposed 'a-acute' + 'b' (2 code points)
    // decomposed composes; ASCII passes untouched; already-composed text
    // is returned as-is; null propagates
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed') AS c, " +
        s"length(nfc_normalize('$decomposed')) AS n, " +
        "nfc_normalize('plain ascii') AS a, " +
        s"nfc_normalize('$composed') AS e, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS z").head()
    assert(r.getString(0) === composed)
    assert(r.getInt(1) === 2)
    assert(r.getString(2) === "plain ascii")
    assert(r.getString(3) === composed)
    assert(r.isNullAt(4))
    // the Column-side helper agrees with the SQL path over generated rows
    import org.apache.spark.sql.functions._
    val df = spark.range(100).select(
      concat(lit("x"), col("id").cast("string"), lit(decomposed)).as("s"))
    val viaCol = df.select(graft.functions.Portable.nfc(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(viaCol.forall(s => s.endsWith(composed) && !s.contains("\u0301")))
  }
}
