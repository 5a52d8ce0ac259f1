package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One inventory entry: a Spark query over an sf directory plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same tables.
  *
  * Determinism contract (SURVEY §5.2 / §7.4): every query ends in an ORDER BY
  * over a unique key, arrays are sorted and string-joined, and float
  * aggregates are either exact (decimal-cast sums, integer-valued doubles)
  * or rounded far from representation noise. Computed columns are aliased to
  * the SAME name in both the Spark plan and the oracle SQL — the driver's
  * compare matches columns by name.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
