package graft

import graft.operators.Dedup
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property test for connected components: on random graphs, the
  * large-star/small-star variant, the min-label propagation variant, and an
  * exact in-Scala union-find must produce identical component labelings
  * (component = its minimum node id).
  */
class CcPropertySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private val edgeGen = Gen.listOfN(35,
    Gen.zip(Gen.choose(0L, 24L), Gen.choose(0L, 24L)))
    .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct)

  private def sample(seed: Long): List[(Long, Long)] =
    edgeGen.apply(Gen.Parameters.default, rng.Seed(seed)).get

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are not guaranteed minimal under naive union; normalize by
    // relabeling every node with the min id of its final root-group
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  test("star CC == propagation CC == union-find on random graphs") {
    (0 until 5).foreach { i =>
      val edges = sample(5000L + i)
      if (edges.nonEmpty) {
        val exp = unionFind(edges)
        val df = edges.toDF("a_id", "b_id")
        val star = Dedup.connectedComponentsStar(df)
          .as[(Long, Long)].collect().toMap
        val prop = Dedup.connectedComponents(df)
          .as[(Long, Long)].collect().toMap
        assert(star == exp, s"star != union-find at seed $i")
        assert(prop == exp, s"propagation != union-find at seed $i")
      }
    }
  }

  test("star CC collapses a long chain (beyond propagation's default reach)") {
    // a 60-node path has diameter 59 — min-label propagation at maxIter=25
    // would throw; the star variant needs only O(log 60) rounds
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = Dedup.connectedComponentsStar(chain)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 60 && labels.values.forall(_ == 0L))
  }
}
