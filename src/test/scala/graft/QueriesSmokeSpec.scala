package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every inventory query runs end-to-end at sf0.001 (fast regression net —
  * the oracle comparison itself is the driver's t2 / tools/local_verify.py).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key corresponds to a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
