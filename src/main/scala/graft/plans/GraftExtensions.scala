package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayDotLong, NfcNormalize}

/** The engine's `SparkSessionExtensions` entry point — the extensibility
  * surface the reference lacks entirely (SURVEY.md §2.4: no UDF/UDAF/
  * extension API). Registers the custom codegen expressions as SQL
  * functions so `spark.sql("SELECT array_dot_long(a, b)")` works
  * anywhere in the session, including pure-SQL callers:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     .getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * Also injects the one optimizer rule the engine genuinely needs —
  * [[BucketizeRangeJoin]], which turns point-in-interval inequality
  * joins (nested-loop by default) into bucketed equi-joins. Everything
  * else the reference does maps to a built-in Catalyst facility
  * (SURVEY.md §4), so no further Rule/Strategy is registered.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.arrayDotLong)
    ext.injectFunction(GraftExtensions.nfcNormalize)
    ext.injectOptimizerRule(_ => BucketizeRangeJoin)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private[plans] val arrayDotLong = (
    new FunctionIdentifier("array_dot_long"),
    new ExpressionInfo(classOf[ArrayDotLong].getName, "array_dot_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "array_dot_long requires exactly 2 arguments")
      ArrayDotLong(children.head, children(1)): Expression
    })

  private[plans] val nfcNormalize = (
    new FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "nfc_normalize requires exactly 1 argument")
      NfcNormalize(children.head): Expression
    })

  /** Register into an already-running session (driver-provided sessions
    * that can't be rebuilt with `.withExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, arrayDotLong._1.funcName, arrayDotLong._2, arrayDotLong._3)
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, nfcNormalize._1.funcName, nfcNormalize._2, nfcNormalize._3)
    if (!spark.experimental.extraOptimizations.contains(BucketizeRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BucketizeRangeJoin
  }
}
