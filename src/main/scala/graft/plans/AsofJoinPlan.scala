package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join: for each left row, the single right row with the
  * greatest `rightTime <= leftTime` among rows with equal keys — the
  * point-in-time lookup, as a first-class operator (logical plan + strategy
  * + physical exec, registered through [[GraftExtensions]]).
  *
  * The reference engine has no joins at all (SURVEY §2.3); Spark has no
  * as-of join either, so this is extension tier (c) of the brief: a whole
  * operator the built-ins can't express directly. The composed
  * union+window form ([[graft.operators.AsofJoin]]) stays as the
  * pure-DataFrame baseline; both are gated against the same DuckDB
  * `ASOF JOIN` oracle.
  *
  * Scale shape: each side declares `ClusteredDistribution` on its keys and
  * a per-partition `(keys, time)` sort — EnsureRequirements co-partitions
  * the two sides exactly as it does for a sort-merge join, then
  * [[AsofJoinExec]] runs a single forward merge per partition:
  * O(n_left + n_right) time, O(1) buffered rows, no union materialization
  * and no window-frame buffering. Shuffle volume equals a plain SMJ on the
  * key; like SMJ, a pathologically hot key serializes within its partition
  * (the salting pattern in [[graft.operators.Skew]] applies if needed).
  *
  * Semantics (mirrors DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`):
  * left-outer — unmatched left rows carry nulls; NULL keys and NULL times
  * never match; ties on (key, time) resolve to the maximum remaining right
  * tuple (the right sort appends the orderable payload columns, and the
  * merge keeps the last row seen).
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None) extends BinaryNode {
  AsofJoin.validateKeys(leftKeys, rightKeys)
  AsofJoin.validateTimes(leftTime, rightTime, tolerance)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** Shared validation for the logical node AND [[AsofJoinExec]] (a directly
    * constructed exec must not skip it): the merge compares left/right times
    * with one natural ordering, so the types must agree; the tolerance gap is
    * computed on the raw physical long (micros for TimestampType), so it is
    * only defined when BOTH time columns are long-backed.
    */
  private[plans] def validateTimes(leftTime: Expression, rightTime: Expression,
                                   tolerance: Option[Long]): Unit = {
    require(leftTime.dataType == rightTime.dataType,
      s"as-of time type mismatch: ${leftTime.dataType} vs ${rightTime.dataType}")
    require(tolerance.isEmpty || {
      import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
      Seq(LongType, TimestampType, TimestampNTZType).contains(leftTime.dataType) &&
        Seq(LongType, TimestampType, TimestampNTZType).contains(rightTime.dataType)
    }, s"tolerance requires long-backed time columns, got " +
       s"${leftTime.dataType}/${rightTime.dataType}")
    require(tolerance.forall(_ >= 0), "tolerance must be >= 0")
  }

  /** Key arity AND type validation: each side hash-partitions on its own
    * key expressions, and Murmur3 of int 5 and long 5 hash differently —
    * mismatched key types would scatter equal keys to different partitions
    * and the keyOrd (built from the LEFT types) would misread the right
    * side's UnsafeRow words: silently wrong matches, no exception.
    */
  private[plans] def validateKeys(leftKeys: Seq[Expression],
                                  rightKeys: Seq[Expression]): Unit = {
    require(leftKeys.length == rightKeys.length, "as-of join key arity mismatch")
    require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
      s"as-of key type mismatch: ${leftKeys.map(_.dataType)} vs " +
        s"${rightKeys.map(_.dataType)} — cast one side first")
  }
}

/** Optimizer rule: push deterministic left-side-only filter conjuncts
  * through the [[AsofJoin]] node into its left child. Catalyst's own
  * pushdown rules stop at unknown logical nodes, so without this a
  * `result.filter(...)` above an as-of join would scan the full left table.
  * Safe because the join is left-outer row-preserving: each left row yields
  * exactly one output row whose left-side columns are untouched, so
  * filtering left rows before or after the join is identical. Right-side
  * conjuncts are NOT pushable (they see post-match nullable columns) and
  * stay above. Once below, FileSourceStrategy carries the filter into the
  * scan's PushedFilters as usual (asserted in PlanQualitySpec).
  */
object PushFilterThroughAsofJoin extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{And, Expression}

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoin) =>
      val (push, keep) = conjuncts(cond)
        .partition(c => c.deterministic && c.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner strategy mapping the logical [[AsofJoin]] to [[AsofJoinExec]]. */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tol) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), tol) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. Children arrive key-clustered and sorted by
  * (keys, time) — the right side additionally by its orderable payload
  * columns, so the "last right row seen" tie-break is deterministic.
  */
/** @param tolerance optional max lookback on the raw long time value
  *                   (micros for TimestampType): a right row matches only if
  *                   `leftTime - rightTime <= tolerance`. Checked at emit on
  *                   the LATEST preceding row only — any earlier row has a
  *                   strictly larger gap, so none can be within tolerance
  *                   when the latest is not.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan,
    tolerance: Option[Long] = None) extends BinaryExecNode {
  AsofJoin.validateKeys(leftKeys, rightKeys)
  AsofJoin.validateTimes(leftTime, rightTime, tolerance)

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Deterministic right-side tie-break: any orderable non-key, non-time
    * output column participates in the sort, so equal (key, time) groups
    * yield their maximum tuple as the match.
    */
  private def rightTieBreak: Seq[Expression] = {
    val used = (rightKeys :+ rightTime).map(_.semanticHash()).toSet
    right.output.filterNot(a => used.contains(a.semanticHash()))
      .filter(a => RowOrdering.isOrderable(a.dataType))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  // one output row per left row, in the left child's order/partitioning
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val outAttrs = output
    // Gap check on raw long time values, gated on tolerance being set: the
    // raw getLong reads are only meaningful for long-backed time columns
    // (validateTimes enforces that exactly when tolerance is defined).
    val hasTol = tolerance.isDefined
    val tol = tolerance.getOrElse(Long.MaxValue)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // buffered right head (+ its key/time, valid until the next advance)
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTimeRow: UnsafeRow = _
        // last right row consumed with key == current left key (copied),
        // plus its raw long time for the tolerance gap check
        private var mRow: InternalRow = _
        private var mKey: UnsafeRow = _
        private var mTime: Long = _
        advanceRight()

        private def advanceRight(): Unit = {
          // skip null-time right rows: a NULL time can never satisfy rt <= lt
          var done = false
          while (!done && rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow)
            rTimeRow = rTimeProj(rRow)
            done = !rTimeRow.isNullAt(0)
          }
          if (!done) { rRow = null; rKey = null; rTimeRow = null }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          numOutputRows += 1
          if (lKey.anyNull) { // NULL keys never match
            return resultProj(joined(lRow, nullRight))
          }
          if (mRow != null && keyOrd.compare(mKey, lKey) != 0) { mRow = null; mKey = null }
          val lTimeRow = lTimeProj(lRow)
          if (lTimeRow.isNullAt(0)) { // NULL left time never matches
            return resultProj(joined(lRow, nullRight))
          }
          // consume right rows that are behind (smaller key) or usable
          // (equal key, time <= left time); remember the latest usable one
          var advancing = true
          while (advancing && rRow != null) {
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0) advanceRight()
            else if (kc == 0 && timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
              if (!rKey.anyNull) {
                mRow = rRow.copy(); mKey = rKey.copy()
                if (hasTol) mTime = rTimeRow.getLong(0)
              }
              advanceRight()
            } else advancing = false
          }
          val matched = mRow != null &&
            (!hasTol || lTimeRow.getLong(0) - mTime <= tol)
          resultProj(joined(lRow, if (matched) mRow else nullRight))
        }
      }
    }
  }
}
