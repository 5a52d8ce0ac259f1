package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-interval (range) join: match point events to the intervals that
  * contain them — the time-windowed enrichment the reference engine lacks
  * entirely (its only join surface is the shuffle of a single keyed
  * dataset; SURVEY §2.3 joins: ABSENT).
  *
  * Naive Spark plans an interval predicate (`start <= ts AND ts <= end`)
  * as BroadcastNestedLoopJoin — O(|L|·|R|) and only viable while one side
  * broadcasts. The scale path (the Flink interval-join / spatial-binning
  * pattern) exploits the span bound: chop time into fixed `bucketSeconds`
  * buckets, explode each interval into the <= span/bucket + 1 buckets it
  * covers, map each point to its single bucket, equi-join on
  * (key, bucket), and refine with the exact range predicate. The join
  * becomes a plain shuffled hash/sort-merge join: shuffle volume is
  * O(|L|·(span/bucket) + |R|), per-bucket work is local, and AQE can split
  * hot (key, bucket) cells. Each (interval, point) pair meets in exactly
  * one bucket — the point's — so no post-join dedup is needed.
  */
object IntervalJoin {

  /** Inner-join `points` to the containing rows of `intervals`.
    *
    * @param intervals     rows with [`startCol`, `endCol`] bounds (both
    *                      timestamps; end - start must be <= some bound
    *                      the caller chooses `bucketSeconds` against)
    * @param points        rows with a point timestamp `tsCol`
    * @param leftKey       equi-key column on the interval side
    * @param rightKey      equi-key column on the point side (pre-rename if
    *                      names collide across sides)
    * @param bucketSeconds bucket width; intervals explode into
    *                      span/bucketSeconds + 1 rows, so pick it near the
    *                      typical span (too small multiplies the left side,
    *                      too large degrades bucket selectivity)
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
                      leftKey: String, rightKey: String,
                      startCol: String, endCol: String, tsCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val b = lit(bucketSeconds)
    // integer bucket ids; sequence() is codegen'd and the explode keeps the
    // interval payload columns alongside each bucket id
    val exploded = intervals
      .withColumn("__bucket",
        explode(sequence(floor(unix_timestamp(col(startCol)) / b),
          floor(unix_timestamp(col(endCol)) / b))))
    val pts = points
      .withColumn("__bucket", floor(unix_timestamp(col(tsCol)) / b))
    exploded.join(pts,
      exploded(leftKey) === pts(rightKey) &&
        exploded("__bucket") === pts("__bucket") &&
        pts(tsCol) >= exploded(startCol) && pts(tsCol) <= exploded(endCol))
      .drop("__bucket")
  }
}
