package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Typed facade reproducing the reference's generic map/reduce contract:
  * arbitrary `map: (docId, text) => Seq[(K, V)]` and whole-group
  * `reduce: (K, Iterator[V]) => O` (see /root/reference/mapper_node.py:51-57
  * and /root/reference/reducer_node.py:50-56 — the reduce fn receives the
  * full value list for a key, it is NOT required to be associative).
  *
  * The reference ships user functions as marshalled Python bytecode; here the
  * same role is played by Scala closures via Spark's built-in closure
  * serialization. `flatMap` + `groupByKey.mapGroups` is the exact semantic
  * match (whole-group reduce, single shuffle on K). The two shipped jobs
  * (word count, inverted index) are ALSO exposed as pure DataFrame plans in
  * [[TextAnalysis]] so Catalyst can use partial aggregation — that form is
  * the benchmarked one; this facade is the fidelity surface.
  */
object MapReduce {
  def mapReduce[K, V, O](docs: Dataset[(String, String)])(
      mapFn: (String, String) => IterableOnce[(K, V)])(
      reduceFn: (K, Iterator[V]) => O)(
      implicit ekv: Encoder[(K, V)], ek: Encoder[K], eko: Encoder[(K, O)]): Dataset[(K, O)] =
    docs
      .flatMap { case (d, t) => mapFn(d, t) }
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, reduceFn(k, it.map(_._2))))

  /** Reference job 1 — word count (mapreduce_wc.py:3-11): map emits
    * (token, 1) per whitespace token; reduce sums.
    */
  def wordCount(docs: Dataset[(String, String)]): Dataset[(String, Long)] = {
    import docs.sparkSession.implicits._
    // \s+ (not " "): Python str.split() splits on ANY whitespace run —
    // a single-space split would carry tabs/newlines inside tokens and
    // diverge from TextFns.tokens and the oracle on non-space whitespace
    mapReduce(docs)((_, text) => text.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1L)))(
      (_, vs) => vs.sum)
  }

  /** Reference job 2 — inverted index (mapreduce_inverted.py:3-11): map emits
    * (token, docId); reduce dedups into a sorted doc list (the reference uses
    * an unordered `set()`; we sort for deterministic output, SURVEY §2.2).
    */
  def invertedIndex(docs: Dataset[(String, String)]): Dataset[(String, Seq[String])] = {
    import docs.sparkSession.implicits._
    mapReduce(docs)((doc, text) => text.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, doc)))(
      (_, vs) => vs.toSeq.distinct.sorted)
  }
}
