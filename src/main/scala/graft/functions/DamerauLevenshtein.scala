package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Full (unrestricted) Damerau–Levenshtein distance kernel, byte-level,
  * pinned to DuckDB's `damerau_levenshtein` (probed before writing:
  * ("CA","ABC") = 2, which rules out the restricted OSA variant — OSA
  * forbids editing a transposed pair again and gives 3; DuckDB
  * implements the Lowrance–Wagner alphabet-indexed DP, so this does
  * too). Byte-level like [[JaroSim]], exact on ASCII columns.
  *
  * Spark's builtin edit distance stops at plain `levenshtein` (no
  * transpositions) — for entity strings whose dominant corruption IS
  * digit/letter swaps, counting a swap as 1 instead of 2 is the whole
  * point, so this is the same genuine custom-Expression case as
  * [[JaroWinkler]]: generated code calls one static kernel, the
  * rescoring stays inside whole-stage codegen.
  *
  * O(|a|·|b|) time and memory per call — sized for entity NAMES (the
  * resolution family's candidate streams), not documents; document
  * similarity belongs to the shingle/MinHash family.
  */
object DamLev {
  /** The kernel; shared verbatim by interpreted eval and codegen. */
  def dist(a: UTF8String, b: UTF8String): Int = {
    val x = a.getBytes
    val y = b.getBytes
    val la = x.length
    val lb = y.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = da(y(j - 1) & 0xFF)
        val j1 = db
        var cost = 1
        if (x(i - 1) == y(j - 1)) { cost = 0; db = j }
        var mn = d(i * w + j) + cost                       // substitute
        val ins = d((i + 1) * w + j) + 1                   // insert
        if (ins < mn) mn = ins
        val del = d(i * w + j + 1) + 1                     // delete
        if (del < mn) mn = del
        val tra = d(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        if (tra < mn) mn = tra                             // transpose
        d((i + 1) * w + j + 1) = mn
        j += 1
      }
      da(x(i - 1) & 0xFF) = i
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamLev.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamLev.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  /** Column-API facade; casts pin both children to StringType. */
  def damerau_levenshtein(a: Column, b: Column): Column =
    GraftShims.column(DamerauLevenshtein(
      GraftShims.expression(a.cast("string")),
      GraftShims.expression(b.cast("string"))))
}
