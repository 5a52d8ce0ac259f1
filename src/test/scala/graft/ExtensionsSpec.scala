package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the custom expressions resolve from plain SQL text in a
  * session built with the extension installed (cluster-wide via
  * spark.sql.extensions=graft.plans.GraftExtensions).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-installed session resolves custom functions in SQL text") {
    val base = LocalSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // reuses the existing SparkContext but builds a fresh SessionState with
    // the extension's injected functions
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT
          |  float_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |               CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c,
          |  float_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
          |            CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d,
          |  size(rhp_table_keys(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), 2, 4, 3)) AS n,
          |  jaro_winkler('MARTHA', 'MARHTA') AS jw
          |""".stripMargin).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(r.getDouble(1) == 11.0)
      assert(r.getInt(2) == 3)
      assert(math.abs(r.getDouble(3) - 0.9611111111) < 1e-9)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
