package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)]): Map[Long, Double] =
    Graph.pageRank(pairs.toDF("a_id", "b_id"))
      .as[(Long, Double)].collect().toMap

  test("pagerank conserves mass (no dangling nodes on a symmetrized graph)") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r)
  }

  test("pagerank is uniform on a regular graph (triangle)") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9, r))
  }

  test("pagerank ranks a star's center above its leaves") {
    val r = ranks(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)))
    val leaves = Seq(1L, 2L, 3L, 4L).map(r)
    assert(leaves.forall(_ < r(10L)), r)
    // leaves are symmetric: identical ranks
    assert(leaves.distinct.size == 1, r)
  }
}
