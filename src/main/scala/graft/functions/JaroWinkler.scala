package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity kernel, byte-level, pinned to the exact
  * convention DuckDB's `jaro_winkler_similarity` implements (probed
  * case-by-case before this was written; FunctionsSpec carries the
  * probe table):
  *
  *  - either side empty → 0.0 (NOT the "both empty → 1" variant);
  *  - match window = max(0, max(|a|,|b|)/2 − 1) — the max(0, ·) clamp
  *    is what makes ("a","a") = 1 while ("a","ba") = 0;
  *  - greedy left-to-right matching; transpositions = mismatched
  *    positions among matched characters, halved with INTEGER
  *    division (an assignment can leave an odd mismatch count — a
  *    3-cycle — and DuckDB floors the half);
  *  - Winkler prefix boost: p ≤ 4 common leading bytes, weight 0.1,
  *    applied ONLY when jaro > 0.7 (the classic boost threshold —
  *    ("abcd","abzz…z") stays at its raw 0.5417).
  *
  * Byte-level (UTF-8) like DuckDB's, so the oracle comparison is exact
  * on ASCII columns; non-ASCII text would diverge from a codepoint
  * implementation in both engines the same way.
  *
  * No Scala/Java stdlib or Spark builtin provides Jaro–Winkler (Spark
  * stops at `levenshtein`), so this is a genuine custom-Expression
  * case (builder-prompt preference (b)): a native Catalyst expression
  * whose generated code calls one static kernel — the fuzzy-match
  * verify stage stays inside whole-stage codegen, no UDF boxing on
  * the candidate-pair stream.
  */
object JaroSim {
  /** The kernel; shared verbatim by interpreted eval and codegen. */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes
    val y = b.getBytes
    val la = x.length
    val lb = y.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && x(i) == y(j)) { ma(i) = true; mb(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    // t/2 is INTEGER division — a match assignment can leave an odd
    // number of mismatched positions (a 3-cycle), and DuckDB floors
    // the half-count (probed: ("hotgear #3","hot gear #3") has 5
    // mismatches → t=2 → 0.9321…, not 2.5 → 0.9204…)
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(la, lb))
    while (p < maxP && x(p) == y(p)) p += 1
    jaro + 0.1 * p * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroSim.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroSim.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column-API facade; casts pin both children to StringType. */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftShims.column(JaroWinkler(
      GraftShims.expression(a.cast("string")),
      GraftShims.expression(b.cast("string"))))
}
