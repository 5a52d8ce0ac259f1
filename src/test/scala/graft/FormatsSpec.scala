package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source/sink format coverage beyond the reference's text files: CSV and
  * JSON round-trips through DataFrameReader/Writer with explicit schemas.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def sample = Seq((1L, "a,b", 1.5), (2L, "c\nd", -0.25), (3L, null: String, 0.0))
    .toDF("id", "s", "v")

  test("csv round-trip preserves rows (quoted separators and newlines)") {
    val dir = Files.createTempDirectory("csv").toString + "/out"
    sample.write.option("header", "true").csv(dir)
    // multiLine: quoted embedded newlines span records otherwise
    val back = spark.read.option("header", "true").option("multiLine", "true")
      .schema("id BIGINT, s STRING, v DOUBLE").csv(dir)
    assert(back.orderBy("id").collect().toSeq ==
      sample.orderBy("id").collect().toSeq)
  }

  test("json lines round-trip preserves rows and types") {
    val dir = Files.createTempDirectory("json").toString + "/out"
    sample.write.json(dir)
    val back = spark.read.schema("id BIGINT, s STRING, v DOUBLE").json(dir)
    assert(back.orderBy("id").collect().toSeq ==
      sample.orderBy("id").collect().toSeq)
  }

  test("parquet writer supports partitioned layout with pruning") {
    val dir = Files.createTempDirectory("pq").toString + "/out"
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
      .write.partitionBy("lang").parquet(dir)
    val en = spark.read.parquet(dir).filter($"lang" === "en")
    assert(en.count() == 2)
    // partition pruning: only the lang=en directory is listed in the scan
    val scan = en.queryExecution.executedPlan.collectLeaves().head.toString
    assert(Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      .exists(_.endsWith("lang=en")))
  }
}
