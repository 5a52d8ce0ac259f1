package graft

import graft.operators.MapReduce
import graft.sources.TextSource
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Integration fixture over the reference's ACTUAL corpus — the four
  * Gutenberg texts in /root/reference/books (~1.5 MB, ~27k lines), the one
  * reference artifact (SURVEY §5.1) not otherwise exercised at its real
  * size. The distributed jobs are cross-checked against an independent
  * SERIAL computation with the reference's own tokenization semantics
  * (Python `str.split()` = any-whitespace; the corpus contains no tabs/CR,
  * so per-line single-space split is equivalent — asserted).
  */
class BooksCorpusSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private val booksDir = "/root/reference/books"

  private def base(f: String): String = f.split("/").last

  /** Independent serial tokenization: whole file, Python-split() semantics. */
  private lazy val serialTokens: Map[String, Seq[String]] =
    Files.list(Paths.get(booksDir)).iterator().asScala.toSeq
      .sortBy(_.toString)
      .map { p =>
        // three of the books carry a UTF-8 BOM; Hadoop's line reader strips
        // it, so the serial reference must too (python utf-8-sig semantics)
        val text = new String(Files.readAllBytes(p), "UTF-8").stripPrefix("\uFEFF")
        base(p.toString) -> text.split("\\s+").toSeq.filter(_.nonEmpty)
      }
      .toMap

  private def sparkDocs = {
    // local fn so the map closure doesn't capture the (non-serializable) spec
    val baseFn = (f: String) => f.split("/").last
    TextSource.readLines(spark, booksDir).as[(String, String)]
      .map { case (f, l) => (baseFn(f), l) }
  }

  test("wordCount over the full Gutenberg corpus matches an independent serial count") {
    val expected = serialTokens.values.flatten
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    assert(expected.values.sum > 200000L, "corpus should be real-sized")
    val got = MapReduce.wordCount(sparkDocs).collect().toMap
    assert(got.size == expected.size,
      s"vocabulary differs: ${got.size} vs ${expected.size}")
    assert(got == expected)
  }

  test("invertedIndex over the full corpus matches an independent serial index") {
    val expected = serialTokens.toSeq
      .flatMap { case (f, toks) => toks.distinct.map(_ -> f) }
      .groupMap(_._1)(_._2).view.mapValues(_.distinct.sorted.toSeq).toMap
    val got = MapReduce.invertedIndex(sparkDocs).collect().toMap
      .view.mapValues(_.toSeq).toMap
    assert(got == expected)
    // sanity: common words index every book, rare words fewer
    assert(got("the") == Seq("book0.txt", "book1.txt", "book2.txt", "book3.txt"))
  }
}
