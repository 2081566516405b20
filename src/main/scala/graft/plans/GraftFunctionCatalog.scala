package graft.plans

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, FunctionCatalog, CatalogPlugin}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `FunctionCatalog` — the catalog-scoped half of the
  * engine's function surface, complementing [[GraftExtensions]]'s
  * session-injected expressions. Registered via
  * `spark.sql.catalog.graftfn=graft.plans.GraftFunctionCatalog`, after
  * which pure-SQL callers resolve `graftfn.ns.permille(a, b)` through
  * the V2 resolution path (no session mutation, shareable across
  * catalogs — the deployment shape for a function LIBRARY at a
  * multi-tenant 100 TB install, where session extensions would have to
  * be baked into every submitter).
  *
  * Both functions implement the MAGIC METHOD (`invoke` with exact
  * primitive signatures): Catalyst binds it reflectively inside
  * whole-stage codegen, so there is no InternalRow boxing on the hot
  * path — `produceResult` stays as the documented fallback only.
  *
  *  - `permille(num BIGINT, den BIGINT)` → `1000·num DIV den` — the
  *    board's house convention for exact integer rates.
  *  - `clamp(x, lo, hi)` → BIGINT clamp, the winsorize primitive.
  */
class GraftFunctionCatalog extends FunctionCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("ns")))
      GraftFunctionCatalog.funcs.keys.map(Identifier.of(Array("ns"), _)).toArray
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    GraftFunctionCatalog.funcs.getOrElse(ident.name(),
      throw new NoSuchElementException(s"function not found: $ident"))
}

object GraftFunctionCatalog {

  private val funcs: Map[String, UnboundFunction] = Map(
    "permille" -> Permille,
    "clamp" -> Clamp)

  object Permille extends UnboundFunction {
    override def name(): String = "permille"
    override def description(): String =
      "permille(num, den) -> 1000*num DIV den (floor division, den > 0)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType.forall(_.dataType == LongType),
        s"permille expects (BIGINT, BIGINT), got $inputType")
      PermilleImpl
    }
  }

  object PermilleImpl extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType, LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "permille"
    override def isDeterministic: Boolean = true
    // magic method: bound reflectively, codegen-friendly (no boxing)
    def invoke(num: Long, den: Long): Long = Math.floorDiv(1000L * num, den)
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getLong(0), input.getLong(1))
  }

  object Clamp extends UnboundFunction {
    override def name(): String = "clamp"
    override def description(): String = "clamp(x, lo, hi) -> BIGINT clamp"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 3 &&
        inputType.forall(_.dataType == LongType),
        s"clamp expects (BIGINT, BIGINT, BIGINT), got $inputType")
      ClampImpl
    }
  }

  object ClampImpl extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType, LongType, LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "clamp"
    override def isDeterministic: Boolean = true
    def invoke(x: Long, lo: Long, hi: Long): Long = Math.max(lo, Math.min(hi, x))
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getLong(0), input.getLong(1), input.getLong(2))
  }
}
