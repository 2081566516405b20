package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the whole-operator extensibility rung
  * (LogicalPlan + Strategy + SparkPlan), for the operator class Spark
  * lacks as a primitive: "for each left row, the value of the latest
  * right row at or before its timestamp, per key".
  *
  * The same semantics exist in this repo as a window composition
  * (operators/TimeSeries.asofJoin — union/last-ignore-nulls), which is
  * how you'd express it WITHOUT extending the engine. The native
  * operator exists because the composition carries the whole right
  * row-set through the left stream's sort; the physical operator below
  * instead demands co-partitioning on the key and per-partition
  * (key, ts) order from the planner — Spark inserts the exchanges and
  * sorts, reusing existing layouts when the data is already bucketed —
  * and then streams BOTH sides through a single-pass merge with O(1)
  * state (the last matching right value). That is the shape a
  * time-series engine gives this join at 100 TB.
  *
  * Scope (documented, deliberate): single integral key and event time
  * (BIGINT/INT/SMALLINT/TINYINT/DATE/TIMESTAMP — all long-comparable
  * physical types), one payload column of ANY atomic type (read via
  * typed accessors, buffer-backed values defensively copied across the
  * reused Unsafe row). Composite keys / nested payloads would swap the
  * primitive accessors for GenerateOrdering/projections; the planner
  * integration (distribution, ordering, strategy) is type-agnostic
  * already.
  */
/** The logical node holds ATTRIBUTE references to its key/ts/payload
  * columns so `references` is truthful — Catalyst's ColumnPruning
  * prunes the children of unknown nodes down to
  * `parentProject.references ++ node.references`, so a node that hides
  * its child dependencies gets its inputs pruned away. The physical
  * ordinals are resolved by exprId in the STRATEGY, i.e. after the
  * optimizer has finished pruning/reordering child outputs. Callers
  * must ensure the two children share no exprIds (see AsOfJoin.asof's
  * re-alias step): the analyzer's DeduplicateRelations rewrites
  * duplicated subtrees but does NOT rewrite the expression fields of
  * unknown parent nodes. */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightPayload: Attribute,
    payloadAttr: AttributeReference,
    tolerance: Long = -1L) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ payloadAttr
  override def producedAttributes: AttributeSet = AttributeSet(payloadAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      def ord(out: Seq[Attribute], a: Attribute): Int = {
        val i = out.indexWhere(_.exprId == a.exprId)
        require(i >= 0, s"as-of column ${a.name}#${a.exprId.id} pruned from ${out.mkString(",")}")
        i
      }
      AsOfJoinExec(
        ord(j.left.output, j.leftKey), ord(j.left.output, j.leftTs),
        ord(j.right.output, j.rightKey), ord(j.right.output, j.rightTs),
        ord(j.right.output, j.rightPayload),
        j.payloadAttr, j.tolerance, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeyOrd: Int, leftTsOrd: Int,
    rightKeyOrd: Int, rightTsOrd: Int, rightPayloadOrd: Int,
    payloadAttr: AttributeReference, tolerance: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ payloadAttr
  override def producedAttributes: AttributeSet = AttributeSet(payloadAttr)

  // co-partition both sides on the key; Spark's EnsureRequirements
  // inserts (or elides, for pre-bucketed data) the exchanges
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(left.output(leftKeyOrd))),
    ClusteredDistribution(Seq(right.output(rightKeyOrd))))

  // per-partition (key, ts) order on both sides → planner adds sorts
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(leftKeyOrd), Ascending),
      SortOrder(left.output(leftTsOrd), Ascending)),
    Seq(SortOrder(right.output(rightKeyOrd), Ascending),
      SortOrder(right.output(rightTsOrd), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  /** Long-valued accessor for the integral key/ts physical types. */
  private def longGetter(dt: org.apache.spark.sql.types.DataType): (InternalRow, Int) => Long =
    dt match {
      case LongType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => (r, i) => r.getLong(i)
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType => (r, i) => r.getInt(i).toLong
      case org.apache.spark.sql.types.ShortType => (r, i) => r.getShort(i).toLong
      case org.apache.spark.sql.types.ByteType => (r, i) => r.getByte(i).toLong
      case other => throw new IllegalArgumentException(
        s"as-of key/ts must be an integral/instant type, got ${other.simpleString}")
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = leftKeyOrd; val lTs = leftTsOrd
    val rKey = rightKeyOrd; val rTs = rightTsOrd; val rPay = rightPayloadOrd
    val getLk = longGetter(left.output(leftKeyOrd).dataType)
    val getLt = longGetter(left.output(leftTsOrd).dataType)
    val getRk = longGetter(right.output(rightKeyOrd).dataType)
    val getRt = longGetter(right.output(rightTsOrd).dataType)
    val payType = payloadAttr.dataType
    val outSchema = left.output :+ payloadAttr
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val proj = UnsafeProjection.create(outSchema.zipWithIndex.map {
        case (a, i) => BoundReference(i, a.dataType, a.nullable)
      })
      val payloadRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      // O(1) merge state: the last right row folded in, its key and ts
      var lastKey = 0L
      var lastTs = 0L
      var lastValid = false
      var lastPayload: Any = null
      // one-row lookahead of the right side (values extracted before
      // advancing — Unsafe row buffers are reused, so buffer-backed
      // payloads (strings/binary/decimal) are copied out)
      var rHas = false
      var rk = 0L; var rt = 0L; var rp: Any = null
      def advance(): Unit = {
        rHas = false
        while (!rHas && ri.hasNext) {
          val r = ri.next()
          if (!r.isNullAt(rKey) && !r.isNullAt(rTs)) {
            rk = getRk(r, rKey); rt = getRt(r, rTs)
            rp = if (r.isNullAt(rPay)) null
                 else InternalRow.copyValue(r.get(rPay, payType))
            rHas = true
          } // null key/ts can never match — skip
        }
      }
      advance()
      li.map { l =>
        if (l.isNullAt(lKey) || l.isNullAt(lTs)) {
          payloadRow.setNullAt(0)
        } else {
          val lk = getLk(l, lKey); val lt = getLt(l, lTs)
          // fold in every right row at or before (lk, lt)
          while (rHas && (rk < lk || (rk == lk && rt <= lt))) {
            lastKey = rk; lastTs = rt; lastValid = true
            lastPayload = rp
            advance()
          }
          // tolerance: the latest at-or-before match is also the latest
          // inside [lt - tolerance, lt], so one staleness test suffices
          if (lastValid && lastKey == lk && lastPayload != null &&
              (tolerance < 0L || lt - lastTs <= tolerance))
            payloadRow.update(0, lastPayload)
          else payloadRow.setNullAt(0)
        }
        proj(joined(l, payloadRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}

  /** DataFrame-level entry: as-of join `left` with `right` on
    * `key` (integral), matching the latest right row with
    * `rightTs <= leftTs` (standard "backward" as-of: equal timestamps
    * match), emitting right's `payload` column (any atomic type) as
    * `outName`. `rightTsName` defaults to `ts` when both sides share
    * the column name. Registers the strategy in the session on first
    * use.
    *
    * Tie semantics: among right rows with IDENTICAL (key, ts), the one
    * folded last in sort order wins — which one that is is not defined
    * (the required child ordering is only (key, ts)). If such ties can
    * carry different payloads, disambiguate upstream (aggregate to one
    * row per (key, ts), or fold the tiebreak into the ts column). */
  /** `tolerance` (optional, in the ts column's units): a match is only
    * emitted while `leftTs - matchTs <= tolerance` — the standard
    * max-staleness bound (pandas merge_asof `tolerance`). The latest
    * at-or-before match is also the latest inside the window, so the
    * merge needs one extra comparison, no extra state. Negative =
    * unbounded (the default). */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
           key: String, ts: String, payload: String, outName: String,
           rightTsName: String = null, tolerance: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = leftDf.sparkSession
    register(spark)
    // Re-alias every right column: both sides usually derive from the
    // same scan, and the analyzer's DeduplicateRelations re-numbers the
    // duplicated subtree WITHOUT rewriting this node's attribute fields
    // — fresh alias exprIds on the right keep our references valid.
    val rightAliased = rightDf.select(rightDf.columns.map(c => col(c).as(c)): _*)
    val lp = leftDf.queryExecution.analyzed
    val rp = rightAliased.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    val rTs = Option(rightTsName).getOrElse(ts)
    val payloadAttr = attr(rp, payload)
    // fail fast on cross-type key/ts pairs: the merge compares raw long
    // encodings, and e.g. a TIMESTAMP (micros) left ts against a DATE
    // (days) right ts would silently compare incompatible units
    def sameType(role: String, l: Attribute, r: Attribute): Unit =
      require(l.dataType == r.dataType,
        s"as-of $role types must match: left ${l.name} is ${l.dataType.simpleString}, " +
          s"right ${r.name} is ${r.dataType.simpleString}")
    sameType("key", attr(lp, key), attr(rp, key))
    sameType("timestamp", attr(lp, ts), attr(rp, rTs))
    val node = AsOfJoin(lp, rp,
      attr(lp, key), attr(lp, ts), attr(rp, key), attr(rp, rTs), payloadAttr,
      AttributeReference(outName, payloadAttr.dataType, nullable = true)(),
      tolerance)
    GraftBridge.ofRows(spark, node)
  }

  /** No-op when the strategy is already present — whether injected at
    * builder time via GraftExtensions (planner.strategies sees those)
    * or added here earlier; double registration would make the planner
    * produce duplicate candidate plans per node. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.planner.strategies.contains(AsOfJoinStrategy) &&
        !spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
}
