package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the static kernel the codegen'd expression
  * ([[graft.plans.JaroWinklerSim]]) calls: the `levenshtein` pattern from
  * Spark's own string expressions, where whole-stage codegen emits ONE
  * static call per row and the loops JIT-compile once (vs. a Scala UDF's
  * per-row encoder round trip).
  *
  * Semantics pinned to the textbook definition, verified empirically
  * against DuckDB's `jaro_winkler_similarity` (the oracle engine):
  *  - match window = floor(max(|a|,|b|) / 2) - 1 (min 0)
  *  - transpositions = (mismatched matched positions) / 2, INTEGER
  *    division (probed: 'abcdef' vs 'bcadef' -> 0.9444..., not the
  *    0.9166... a float halving would give)
  *  - jaro accumulated in the order m/|a| + m/|b| + (m-t)/m, then / 3
  *    (reproduces DuckDB's 0.70000000000000007 on the 0.6+0.5+1.0 case —
  *    same doubles in, same double out)
  *  - Winkler boost jaro + l * 0.1 * (1 - jaro) over the <= 4-char common
  *    prefix, applied only when jaro > 0.7 (probed: j <= 0.7 pairs come
  *    back unboosted from DuckDB)
  *  - empty input -> 0.0; equal strings -> 1.0
  */
object JaroWinkler {

  def similarity(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString
    val b = r.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(la, lb))
    while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
