package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with rts <= lts per
  * key — the time-series point-in-time lookup the reference engine lacks
  * entirely (SURVEY §2.3 joins: ABSENT).
  *
  * Implementation is the single-shuffle union + running-last window trick
  * rather than a range join: tag both sides, sort (key, ts, side) with right
  * rows first at equal timestamps, and carry the last-seen right payload
  * forward with `last(..., ignoreNulls = true)`. One shuffle on the key, no
  * per-key quadratic blowup, no custom physical operator needed — exactly
  * the plan shape that scales to skewed keys under AQE.
  */
object AsofJoin {

  /** @param left        left (probe) rows
    * @param right       right (quote/reference) rows
    * @param key         equi-join key column name (same name both sides)
    * @param ts          event-time column name (same name both sides)
    * @param rightCols   right columns to carry (emitted as matched_<name>,
    *                    null when no right row precedes the left row). Must
    *                    be of orderable types (no maps): the payload struct
    *                    doubles as the deterministic tie-breaker sort key.
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)
    // common-schema union: right rows sort before left rows at equal ts so
    // "<=" (not "<") semantics hold
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"), lit(null).cast(
        right.select(payload).schema.head.dataType).as("__r")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col): _*)
    // SQL join semantics: a NULL-keyed or NULL-timed right row can never be
    // anyone's match — drop them before the union. (Unfiltered, a NULL key
    // would still group with NULL-keyed left rows in the window partition,
    // and a NULL ts would sort NULLS FIRST and be carried as a bogus
    // "preceding" match.) Left rows with NULL key/ts then fall out
    // unmatched for free: their partition holds no right rows / no right
    // row precedes them. AsofPropertySpec pins this against the native
    // operator and an in-Scala reference on randomized null-heavy data.
    val r = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(
        Seq(col(key), col(ts), lit(0).as("__side"), payload.as("__r")) ++
          leftCols.filterNot(c => c == key || c == ts)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // __r as the final sort key: among right rows sharing (key, ts), ties
    // are broken by the payload struct's field-wise order, so the carried
    // match is deterministic (the max payload) instead of partition-order
    // dependent. Left rows sort by (ts, __side) alone (__r is null, and
    // NULLS FIRST keeps them after right rows only via __side).
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__match.$c").as(s"matched_$c")): _*)
  }

  /** Native-operator form: plans a [[graft.plans.AsofJoin]] logical node,
    * executed by [[graft.plans.AsofJoinExec]]'s single-pass partition merge
    * (vs this object's union+window composition — same semantics, same
    * oracle, different physical strategy; see the exec's scaladoc for the
    * scale comparison). Column names must be disjoint across the two sides
    * (pre-rename the right side); the strategy is auto-registered.
    */
  /** @param toleranceMicros optional max lookback (raw long units — micros
    *   for timestamp columns): match only right rows with
    *   `lts - rts <= toleranceMicros`, the practical bounded-staleness
    *   time-series variant (a quote older than the bound is no quote).
    */
  def asofNative(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 leftTs: String, rightTs: String,
                 toleranceMicros: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    // fail fast on precondition violations that would otherwise produce
    // silently wrong results: a shared column name means a duplicate
    // exprId in the join output (the projection would bind the right-side
    // occurrence to the left ordinal), and mismatched time types would
    // compare raw physical values (micros vs days)
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"asofNative requires disjoint column names; shared: $shared (pre-rename one side)")
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"time column types differ: ${left.schema(leftTs).dataType} vs ${right.schema(rightTs).dataType}")
    val spark = left.sparkSession
    bridge.ensureStrategy(spark, new graft.plans.AsofJoinStrategy)
    bridge.ensureOptimizerRule(spark, graft.plans.PushFilterThroughAsofJoin)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    bridge.ofRows(spark, graft.plans.AsofJoin(lp, rp,
      Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
      attr(lp, leftTs), attr(rp, rightTs), toleranceMicros))
  }
}
