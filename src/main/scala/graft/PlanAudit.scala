package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Whole-inventory plan audit: compiles every query's physical plan and
  * flags the join anti-patterns that silently creep in as the inventory
  * grows — fine at sf0.01, fatal at 100 TB. Complements PlanQualitySpec
  * (which pins targeted GOOD shapes): this sweep is the catch-all for
  * queries nobody wrote an assert for yet.
  *
  * Flags:
  *  - CartesianProduct — never acceptable
  *  - BroadcastNestedLoopJoin whose build side is NOT provably tiny — a
  *    build side is fine when it is a scalar aggregate (no grouping keys:
  *    one row by construction) or a literal VALUES table; anything else is
  *    the all-pairs shape and must be on the documented-anchor allowlist
  *
  * Exit code 1 if any unallowed flag fires (usable as a gate).
  * `sbt "runMain graft.PlanAudit"` — add query names to restrict.
  */
object PlanAudit {

  /** Documented n^2 oracle anchors (scale twins are bucketed/LSH) and
    * dimension-sized theta joins — the ONLY queries allowed a non-scalar
    * nested-loop build.
    */
  private val nlAllowed = Set(
    "dd_embedding_cosine", "dd_ngram_jaccard", "dd_containment",
    "dd_neardup_filter", "dd_threshold_sweep",
    "fn_levenshtein", "rel_join_theta", "sim_threshold_tuning")

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
      case _ => Seq(p)
    }
    self ++ p.children.flatMap(walk) ++
      p.subqueries.flatMap(walk)
  }

  /** Deliberately-reduced build side. The silent-creep danger this audit
    * exists for is a RAW-SCAN nested-loop build (Catalyst picking BNLJ for
    * a non-equi join over an unreduced table, or a broadcast() landing on
    * the wrong side) — so a build subtree counts as reduced when it holds:
    *  - any aggregate (scalar totals are 1 row; grouped aggregates are
    *    distinct-key-sized — the centroid/date-spine shapes; a HUGE
    *    grouped agg under an explicit broadcast would fail loudly at run
    *    time, which is not the silent class this audit hunts), or
    *  - a literal-pinned filter (vec_id IN (...) / === literal — the
    *    broadcast-query-side pattern of the sim_ family), or
    *  - a literal VALUES table.
    */
  private def tinySide(p: SparkPlan): Boolean = walk(p).exists {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec => true
    case l: LocalTableScanExec => l.rows.size <= 100
    case f: org.apache.spark.sql.execution.FilterExec =>
      f.condition.exists {
        case _: org.apache.spark.sql.catalyst.expressions.In => true
        case _: org.apache.spark.sql.catalyst.expressions.InSet => true
        case eq: org.apache.spark.sql.catalyst.expressions.EqualTo =>
          eq.right.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] ||
            eq.left.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
        case _ => false
      }
    case _ => false
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        graft.sources.TempDirs.create("graft_warehouse").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.allQueries.map(_.name)
    var flagged = 0
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        val issues = walk(plan).flatMap {
          case _: CartesianProductExec => Some("CartesianProduct")
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            }
            if (tinySide(build) || nlAllowed(n)) None
            else Some("BroadcastNestedLoopJoin(non-scalar build)")
          case _ => None
        }.distinct
        if (issues.nonEmpty) {
          flagged += 1
          println(s"FLAG $n: ${issues.mkString(", ")}")
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"FLAG $n: plan compile failed: ${e.getMessage}")
      }
    }
    println(s"AUDIT ${if (flagged == 0) "CLEAN" else s"$flagged FLAGGED"} (${names.size} plans)")
    spark.stop()
    if (flagged > 0) sys.exit(1)
  }
}
