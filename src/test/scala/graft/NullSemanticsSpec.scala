package graft

/** SQL three-valued-logic pins for the NOT IN family: a NULL in the
  * subquery list empties the NOT IN result (UNKNOWN is not TRUE), while
  * IN / null-free NOT IN partition the probe side exactly. */
class NullSemanticsSpec extends SparkSpec {

  test("NOT IN truth table: arms partition customers, NULL list empties NOT IN") {
    val rows = graft.operators.Relational4.nullAwareAnti(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("has_big_order", "no_big_order", "null_poisoned"))
    // one NULL in the list → every NOT IN predicate is UNKNOWN → empty
    assert(rows("null_poisoned") == 0L, rows.toString)
    // the null-free IN / NOT IN arms partition the customer table
    val total = graft.operators.Tables.t(spark, sf("sf0.001"), "customer").count()
    assert(rows("has_big_order") + rows("no_big_order") == total, rows.toString)
    assert(rows("has_big_order") > 0L && rows("no_big_order") > 0L, rows.toString)
  }
}
