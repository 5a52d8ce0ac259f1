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

  test("orc round-trip preserves rows, types, and pushes filters") {
    val dir = Files.createTempDirectory("orc").toString + "/out"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity", $"l_returnflag")
    li.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    val filtered = back.filter($"l_quantity" > 40.0)
    assert(filtered.count() == li.filter($"l_quantity" > 40.0).count())
    // ORC scans take pushed filters just like parquet
    val p = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity,40.0)"), p)
  }

  test("bucketed tables join on the bucket key without any exchange") {
    import graft.sources.BucketedSink
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"lang")
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id".as("doc_id"), $"label")
    BucketedSink.writeBucketed(docs, "docs_bucketed", 8, Seq("doc_id"))
    BucketedSink.writeBucketed(embs, "embs_bucketed", 8, Seq("doc_id"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: a broadcast join would trivially avoid the
    // shuffle (and its BroadcastExchange would also trip the assert below)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("docs_bucketed").join(spark.table("embs_bucketed"), "doc_id")
      val expected = docs.join(embs, "doc_id").count()
      assert(j.count() == expected && expected > 0)
      // co-bucketed scans already satisfy the join's required distribution:
      // the executed plan must contain NO exchange of any kind
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
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

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    // A 100 TB corpus never rewrites history when a column is added: old
    // landing dates keep the v1 schema, new dates carry v2, and readers
    // union them — added columns read NULL for v1 files.
    val dir = Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "text").write.parquet(s"$dir/d=1")
    Seq((2L, "b", "en")).toDF("id", "text", "lang").write.parquet(s"$dir/d=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "text", "lang", "d"))
    val rows = merged.select("id", "lang").as[(Long, Option[String])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some("en")), rows)
  }
}
