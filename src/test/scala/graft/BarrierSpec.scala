package graft

import graft.operators.Barrier
import org.scalatest.funsuite.AnyFunSuite

/** O12 — explicit stage barrier (barrier execution mode): gang scheduling,
  * full-roster visibility, and the rendezvous ordering proof.
  */
class BarrierSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  test("barrier stage gang-schedules, sees the full roster, and synchronizes") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = Barrier.barrierStage(spark, docs, "doc_id", slots = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 3, "one row per gang task")
    assert(out.map(_._1).sorted.toSeq == Seq(0, 1, 2))
    assert(out.map(_._2).sum == docs.count(), "no rows lost across tasks")
    assert(out.forall(_._3 == 3), "every task sees the full task roster")
    // the rendezvous proof: every task's pre-barrier stamp precedes every
    // task's post-barrier stamp — impossible unless barrier() held each
    // task until ALL tasks arrived
    assert(out.map(_._4).max <= out.map(_._5).min,
      s"barrier did not synchronize: $out")
  }
}
