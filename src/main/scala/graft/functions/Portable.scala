package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable deterministic primitives.
  *
  * The harness hash-compares Spark results against a DuckDB oracle, so
  * every "random-ish" value (hashes, quantized floats) must be computable
  * bit-identically in both engines. These helpers use only constructs with
  * exact, engine-independent semantics:
  *
  *  - `hash60`: first 15 hex chars of md5 as a non-negative BIGINT
  *    (DuckDB: `('0x' || substr(md5(x),1,15))::BIGINT`). Unlike
  *    xxhash64/murmur, md5 is identical everywhere.
  *  - `quantize`: fixed-point rounding `floor(x*10000 + 0.5)` — floor is
  *    exact in IEEE, so both engines produce the same integer; all
  *    downstream arithmetic (dot products, norms) is integer-exact and
  *    the final float division/sqrt of identical inputs is identical
  *    (IEEE ops are correctly rounded).
  *
  * All of this stays inside whole-stage codegen (built-ins only, no UDFs).
  */
object Portable {

  /** 60-bit non-negative deterministic hash of a string column.
    * DuckDB equivalent: `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** hash60 reduced mod n (n small → no overflow anywhere). */
  def hashMod(c: Column, n: Int): Column = pmod(hash60(c), lit(n.toLong))

  /** Fixed-point quantization of a float/double array column to BIGINTs at
    * 1e-4 resolution. DuckDB:
    * `list_transform(v, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT))`. */
  def quantize(arr: Column): Column =
    transform(arr, x => floor(x.cast("double") * 10000d + 0.5d).cast("long"))

  /** Exact integer dot product of two quantized (BIGINT) arrays — a
    * native codegen'd expression (see ArrayDotLong for why not the
    * higher-order-function form; results are identical). */
  def dotQ(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ArrayDotLong(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Exact integer squared norm of a quantized array. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine similarity from quantized arrays — exact-identical doubles in
    * both engines (integer dot/norms, then correctly-rounded sqrt & div). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(normSqQ(a).cast("double")) * sqrt(normSqQ(b).cast("double")))

  /** Unicode NFC canonical composition — a native codegen'd expression
    * (Spark has no normalization builtin). DuckDB: `nfc_normalize(x)`;
    * both implement Unicode TR15, so outputs are byte-identical. */
  def nfc(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
  }
}
