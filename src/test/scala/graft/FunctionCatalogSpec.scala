package graft

import org.apache.spark.sql.connector.catalog.Identifier
import graft.plans.GraftFunctionCatalog

/** The V2 FunctionCatalog: resolution through a catalog-qualified name,
  * magic-method (codegen) binding, discovery, and bind-time type
  * errors. */
class FunctionCatalogSpec extends SparkSpec {

  private def ensureRegistered(): Unit =
    spark.conf.set("spark.sql.catalog.graftfn",
      classOf[GraftFunctionCatalog].getName)

  test("catalog-qualified scalar functions resolve and compute in pure SQL") {
    ensureRegistered()
    val row = spark.sql(
      "SELECT graftfn.ns.permille(250L, 1000L) AS p, graftfn.ns.clamp(99L, 0L, 10L) AS c"
    ).collect().head
    assert(row.getLong(0) === 250L)
    assert(row.getLong(1) === 10L)
    // floor division on negatives (Math.floorDiv, not truncation)
    assert(spark.sql("SELECT graftfn.ns.permille(-1L, 3L) AS p")
      .collect().head.getLong(0) === -334L)
  }

  test("the magic method binds as a codegen Invoke, not the row-based fallback") {
    ensureRegistered()
    val df = spark.sql("SELECT graftfn.ns.permille(id, 7L) AS p FROM range(10)")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("invoke"), s"expected reflective magic-method binding in:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq ===
      (0L until 10L).map(k => 1000 * k / 7).toSeq)
  }

  test("discovery lists both functions; unknown names and bad types fail cleanly") {
    val cat = new GraftFunctionCatalog
    cat.initialize("graftfn", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    val listed = cat.listFunctions(Array("ns")).map(_.name()).toSet
    assert(listed === Set("permille", "clamp"))
    intercept[NoSuchElementException] {
      cat.loadFunction(Identifier.of(Array("ns"), "nope"))
    }
    ensureRegistered()
    intercept[Exception] {
      spark.sql("SELECT graftfn.ns.permille('a', 'b')").collect()
    }
  }
}
