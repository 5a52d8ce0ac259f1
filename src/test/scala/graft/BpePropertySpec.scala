package graft

import graft.operators.CurationQueries
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the declarative BPE merge-learning loop: on random
  * small corpora, the 5 learned merges must equal a plain-Scala reference
  * implementation of the same algorithm (string-replace merge semantics —
  * Java String.replace is left-to-right non-overlapping, the same contract
  * Spark's and DuckDB's replace() follow, so one reference serves all
  * three). The DuckDB oracle gates the fixed corpus; this gates the
  * ALGORITHM across corpus shapes it never sees — repeated runs, ties,
  * single-char words, merges that cascade into earlier merges.
  */
class BpePropertySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  /** Plain-Scala BPE learner: identical tie-breaks ((support desc, pair
    * asc)), identical replace semantics, top-200 (cnt desc, word) vocab.
    */
  private def bruteBpe(words: Seq[String], rounds: Int): Seq[(Int, String, Long)] = {
    val wc = words.filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val top = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(200)
    var syms = top.map { case (w, c) => (" " + w.mkString(" ") + " ", c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    for (r <- 1 to rounds) {
      val support = scala.collection.mutable.Map.empty[String, Long]
      syms.foreach { case (sym, c) =>
        val tk = sym.split(" ").filter(_.nonEmpty)
        (0 until tk.length - 1).foreach { i =>
          val p = tk(i) + " " + tk(i + 1)
          support(p) = support.getOrElse(p, 0L) + c
        }
      }
      if (support.nonEmpty) {
        val (pair, sup) = support.toSeq.minBy { case (p, c) => (-c, p) }
        out += ((r, pair, sup))
        val merged = pair.replace(" ", "")
        syms = syms.map { case (sym, c) =>
          (sym.replace(" " + pair + " ", " " + merged + " "), c)
        }
      }
    }
    out.toSeq
  }

  test("learned merges equal the plain-Scala reference on random corpora") {
    val alphabets = Seq("ab", "abc", "abcd")
    (0 until 6).foreach { seed =>
      val rng = new scala.util.Random(4242 + seed)
      val alpha = alphabets(seed % alphabets.length)
      val words = Seq.fill(120)(
        Seq.fill(1 + rng.nextInt(6))(alpha(rng.nextInt(alpha.length))).mkString)
      val docs = words.grouped(10).zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "), "en", "synth", 0L)
      }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      val exp = bruteBpe(words, rounds = 5)
      val got = CurationQueries.bpeMergesFromDocs(docs)
        .orderBy("round")
        .as[(Int, String, Long)].collect().toSeq
      assert(got == exp, s"seed=$seed alpha=$alpha")
    }
  }

  test("repeated-run corpora: replace semantics stay engine-consistent") {
    // "aaaa"-style runs are where string-replace BPE and canonical BPE
    // diverge; the CONTRACT here is reference-impl equality, which pins
    // the left-to-right non-overlap behavior explicitly
    val words = Seq.fill(50)("aaaa") ++ Seq.fill(30)("aaa") ++ Seq.fill(20)("aa")
    val docs = Seq((0L, words.mkString(" "), "en", "synth", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val exp = bruteBpe(words, rounds = 5)
    val got = CurationQueries.bpeMergesFromDocs(docs)
      .orderBy("round")
      .as[(Int, String, Long)].collect().toSeq
    assert(got == exp)
    // round 1 must merge "a a" with support = total adjacent pairs
    assert(got.head._2 == "a a" && got.head._3 == (50L * 3 + 30 * 2 + 20))
  }
}
