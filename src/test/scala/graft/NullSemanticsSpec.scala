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

  test("column profile reports sane ANALYZE stats for lineitem") {
    val rows = graft.operators.Relational5.columnProfile(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.size == 11)
    assert(rows("l_returnflag").getLong(1) == 3L)  // A/N/R
    assert(rows("l_linestatus").getLong(1) == 2L)  // F/O
    assert(rows.values.forall(_.getLong(2) == 0L), "fixture has no NULLs")
    // numeric min <= max wherever present; string slots carry the extremes
    rows.values.filter(r => !r.isNullAt(3)).foreach(r =>
      assert(r.getDouble(3) <= r.getDouble(4), r.toString))
    assert(rows("l_returnflag").getString(5) == "A" &&
      rows("l_returnflag").getString(6) == "R")
    // key NDV is bounded by the table's row count, and positive
    val n = graft.operators.Tables.t(spark, sf("sf0.001"), "lineitem").count()
    assert(rows("l_orderkey").getLong(1) > 0L && rows("l_orderkey").getLong(1) <= n)
  }
}
