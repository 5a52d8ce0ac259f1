package graft

import graft.operators.{MapReduce, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-semantics golden tests (SURVEY §5.2): word count and inverted
  * index vs independently computed results, on both the DataFrame plans and
  * the typed mapReduce facade. Comparisons are order-insensitive / set-valued
  * per the reference's nondeterminism notes (SURVEY §2.2).
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private val docs = Seq(
    ("d0", "the cat sat on the mat"),
    ("d1", "the dog sat"),
    ("d2", "cat dog cat"))

  private def expectedCounts: Map[String, Long] =
    docs.flatMap(_._2.split(" ")).groupBy(identity).map { case (w, l) => w -> l.size.toLong }

  private def expectedIndex: Map[String, Set[String]] =
    docs.flatMap { case (d, t) => t.split(" ").map(w => (w, d)) }
      .groupBy(_._1).map { case (w, l) => w -> l.map(_._2).toSet }

  test("DataFrame word count matches hand-computed counts") {
    val df = docs.toDF("doc_id", "text")
    val got = TextAnalysis.wordCount(df).as[(String, Long)].collect().toMap
    assert(got == expectedCounts)
  }

  test("mapReduce facade word count equals DataFrame plan") {
    val ds = docs.toDS()
    val facade = MapReduce.wordCount(ds).collect().toMap
    assert(facade == expectedCounts)
  }

  test("inverted index matches hand-computed index (set compare)") {
    val df = Seq((0L, "a b a"), (1L, "b c"), (2L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(df)
      .select($"word", $"doc_list").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "0,2", "b" -> "0,1", "c" -> "1"))
  }

  test("mapReduce facade inverted index matches expected sets") {
    val ds = docs.toDS()
    val got = MapReduce.invertedIndex(ds).collect().toMap
    assert(got.view.mapValues(_.toSet).toMap == expectedIndex)
  }

  test("word count total equals token count (conservation)") {
    val df = docs.toDF("doc_id", "text")
    val total = TextAnalysis.wordCount(df).agg(sum($"cnt")).as[Long].head()
    assert(total == docs.map(_._2.split(" ").length).sum)
  }

  test("fingerprint is order-sensitive") {
    val df = Seq((0L, "a b"), (1L, "b a")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df).as[(Long, Long)].collect().toMap
    assert(fps(0L) != fps(1L))
  }

  test("langId prediction is deterministic and covers all languages") {
    val df = Seq((0L, "the a fast fast", "en"), (1L, "join scan sort", "de"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langId(df).select($"doc_id", $"pred_lang").as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "en", 1L -> "de"))
  }
}
