package graft

/** The driver contract surface itself: entry() returns rows, every
  * declared query has a builder, and every oracle key has a query. */
class EntrySpec extends SparkSpec {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are stable and unique across modules") {
    val total = SparkEntry.modules.map(_._1.size).sum
    assert(SparkEntry.queries.size === total,
      "duplicate query names collapsed in the merged map")
    val oracleTotal = SparkEntry.modules.map(_._2.size).sum
    assert(SparkEntry.oracleSql.size === oracleTotal,
      "duplicate oracle names collapsed in the merged map")
  }

  test("every query has an oracle (no silently-unverified entries)") {
    val unverified = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unverified.isEmpty, s"query without oracle: $unverified")
  }

  test("no query emits array/map/struct output columns (comparator contract)") {
    // The driver's pandas comparator sorts every output column; nested
    // types are unhashable there and red-row the query even when values
    // match. Scalarize (array_join / to_json) before returning.
    val sfDir = sf("sf0.001")
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty, s"nested output columns: $offenders")
  }
}
