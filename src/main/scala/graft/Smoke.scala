package graft

import org.apache.spark.sql.SparkSession

/** Quick end-to-end smoke: runs SparkEntry.entry (the driver's t1 gate) and
  * prints the row count. `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY ROWS: " + df.count())
    df.show(5, truncate = false)
    spark.stop()
  }
}
