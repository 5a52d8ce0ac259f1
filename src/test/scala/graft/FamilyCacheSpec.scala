package graft

import graft.operators.FamilyCache
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the bounded family-cache LRU: capacity bound, LRU
  * touch on hit, least-recently-used eviction order, and the evict hook
  * firing exactly once per evicted frame (the hook is what releases
  * checkpoint blocks in production — double-fire would unpersist a LIVE
  * frame, no-fire re-creates the r7 leak).
  */
class FamilyCacheSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private def df(tag: Int) = {
    import spark.implicits._
    Seq(tag).toDF("v")
  }

  test("tuple-valued cache (gram/power family) releases every member on evict") {
    // the r9 generalization to FamilyCache[K, V]: OpsQueries caches the
    // (gU, g, v) spectral triple with an onEvict that must release ALL
    // THREE frames — a partial release would leak two checkpoints per
    // evicted data dir
    val released = scala.collection.mutable.ArrayBuffer.empty[Int]
    type Triple = (Int, Int, Int)
    val cache = new FamilyCache[String, Triple](maxEntries = 1,
      onEvict = { case (a, b, c) => released ++= Seq(a, b, c) })
    cache.getOrElseUpdate("d1", (1, 2, 3))
    cache.getOrElseUpdate("d2", (4, 5, 6))
    assert(cache.size == 1 && released.toSeq == Seq(1, 2, 3), released)
  }

  test("bounded LRU: capacity, touch-on-hit, eviction order, single-fire hook") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[Int]
    val cache = new FamilyCache[Int, org.apache.spark.sql.DataFrame](
      maxEntries = 2, onEvict = d => evicted += d.head().getInt(0))
    val (a, b, c) = (df(1), df(2), df(3))
    assert(cache.getOrElseUpdate(1, a) eq a)
    assert(cache.getOrElseUpdate(2, b) eq b)
    assert(cache.size == 2 && evicted.isEmpty)
    // hit returns the cached instance without building the thunk
    assert(cache.getOrElseUpdate(1, fail("thunk must not run on hit")) eq a)
    // inserting a third evicts the LRU — key 2, since key 1 was touched
    assert(cache.getOrElseUpdate(3, c) eq c)
    assert(cache.size == 2 && evicted.toSeq == Seq(2))
    // key 1 survived; key 2 rebuilds fresh
    assert(cache.getOrElseUpdate(1, fail("1 should have survived")) eq a)
    val b2 = df(2)
    assert(cache.getOrElseUpdate(2, b2) eq b2)
    assert(evicted.toSeq == Seq(2, 3), s"got $evicted")
  }
}
