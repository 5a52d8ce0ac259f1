package graft.operators

import org.apache.spark.BarrierTaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O12 — the reference's stage-barrier surface
  * (/root/reference/master.py: the master polls every mapper's
  * `<job>_status` key and starts reducers only after ALL report DONE),
  * re-expressed on Spark's two native barrier mechanisms.
  *
  * Mechanism 1 — implicit: every Spark shuffle IS a stage barrier (no
  * reduce task fetches until the map stage commits); that is why O12 was a
  * declared non-goal through round 6 — the DAGScheduler subsumes the
  * master's polling loop for every query in this repo.
  *
  * Mechanism 2 — explicit, this file: barrier execution mode
  * (`RDD.barrier().mapPartitions` + `BarrierTaskContext`), Spark's surface
  * for gang-scheduled stages whose tasks must launch TOGETHER and
  * rendezvous mid-task — the embedded-distributed-training shape (each
  * task hosts a worker that all-reduces with its peers). [[barrierStage]]
  * runs one such stage and emits per-task evidence that the contract held:
  * the full task roster each task observed, and nanotime stamps around the
  * rendezvous — across tasks, every pre-barrier stamp precedes every
  * post-barrier stamp iff the barrier actually synchronized (asserted in
  * BarrierSpec; timing columns are nondeterministic, so this operator is
  * spec-gated rather than oracle-gated).
  *
  * Scale note: barrier mode requires `slots` simultaneously free cores —
  * the gang constraint is the cost (a plain shuffle schedules tasks
  * independently and should be preferred whenever the computation doesn't
  * genuinely need mid-task peer rendezvous).
  */
object Barrier {

  /** One gang-scheduled barrier stage over `keyCol`: each task counts its
    * partition, stamps the clock, rendezvouses, stamps again. Returns
    * (task_id, n_rows, n_tasks_seen, pre_barrier_ns, post_barrier_ns).
    */
  def barrierStage(spark: SparkSession, df: DataFrame, keyCol: String,
                   slots: Int): DataFrame = {
    require(slots >= 1, s"bad slot count $slots")
    import spark.implicits._
    val rdd = df.select(col(keyCol).cast("long")).rdd
      .map(_.getLong(0))
      .repartition(slots)
    rdd.barrier()
      .mapPartitions { it =>
        val ctx = BarrierTaskContext.get()
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        val roster = ctx.getTaskInfos().length
        val pre = System.nanoTime()
        ctx.barrier()
        val post = System.nanoTime()
        Iterator.single((ctx.partitionId(), n, roster, pre, post))
      }
      .toDF("task_id", "n_rows", "n_tasks_seen", "pre_barrier_ns", "post_barrier_ns")
  }
}
