package graft

import graft.operators.Multimodal
import graft.sources.TextSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SourcesAndMultimodalSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private val booksDir = getClass.getResource("/books").getPath

  test("readLines yields (file, line) records for every line") {
    val df = TextSource.readLines(spark, booksDir)
    assert(df.columns.toSeq == Seq("file", "line"))
    assert(df.select("file").distinct().count() == 3)
    assert(df.count() > 6)
  }

  test("readDocuments yields one (file, text) record per file") {
    val df = TextSource.readDocuments(spark, booksDir)
    assert(df.count() == 3)
    val texts = df.as[(String, String)].collect().toMap
    assert(texts.keys.forall(_.endsWith(".txt")))
    assert(texts.values.exists(_.contains("universally acknowledged")))
  }

  test("writeTsv round-trips tab-separated key-value lines") {
    val out = Files.createTempDirectory("tsv").toString + "/wc"
    val wc = Seq(("cat", 3L), ("dog", 1L)).toDF("word", "cnt")
    TextSource.writeTsv(wc, out, singleFile = true)
    val back = spark.read.text(out).as[String].collect().toSet
    assert(back == Set("cat\t3", "dog\t1"))
  }

  test("multimodal payload carries bytes + metadata struct") {
    val docs = Seq((1L, "hello", "en", "s", 5L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = Multimodal.withPayload(docs).select("media.n_bytes", "media.mime").head()
    assert(row.getLong(0) == 5L)
    assert(row.getString(1) == "text/plain")
  }

  test("extractFeatures (stub decode) is deterministic with the right shape") {
    val docs = Seq((1L, "abc", "en", "s", 3L), (2L, "abd", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = Multimodal.extractFeatures(Multimodal.withPayload(docs), dim = 8)
      .select(col("doc_id"), col("features")).as[(Long, Seq[Float])].collect().toMap
    assert(f(1L).length == 8)
    assert(f(1L) != f(2L))                 // content-sensitive
    assert(f(1L).forall(x => x >= 0f && x < 1f))
    val again = Multimodal.extractFeatures(Multimodal.withPayload(docs), dim = 8)
      .select(col("doc_id"), col("features")).as[(Long, Seq[Float])].collect().toMap
    assert(f == again)                     // deterministic
  }
}
