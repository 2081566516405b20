package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the harness testdata (TESTDATA.md): one parquet file
  * per table under the given scale-factor directory. The Spark analog of
  * the reference's catalog — `database::table_vec`
  * (/root/reference/src/database/common/database.h:10-22) — is just
  * schema-on-read parquet scans; Catalyst gets filter pushdown and column
  * pruning on every access for free.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      // events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read as a
      // timestamp; read it as a Long of epoch-nanos instead. Integer ns
      // math is also exactly reproducible in the DuckDB oracle (epoch_ns),
      // unlike double-valued epoch().
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
