package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation against a FROZEN piece
  * vocabulary — the deterministic "tokenizer apply" step (WordPiece
  * inference semantics: at each position take the longest vocabulary
  * piece, else emit the single character as a fallback piece and
  * count it). Unlike BPE TRAINING (q128, inherently iterative →
  * rows-only), applying a frozen vocab is a pure function of
  * (word, vocab), so the DuckDB oracle replays it exactly with a
  * recursive CTE and the family gets a value-level oracle.
  *
  * Scale shape: the expression is meant to run on DISTINCT words
  * (the standard memoization — segment the vocabulary once, join
  * back to occurrences), so its per-row loop prices in at
  * |distinct words|, not corpus tokens. Native Catalyst expression
  * with `doGenCode` (PolyHash precedent) — the generated code is one
  * static call into [[Subword.segment]], no UDF boxing.
  *
  * Result is a packed long: (n_pieces << 32) | n_fallback — split
  * with shiftright/mask, both codegen'd.
  */
case class SubwordStats(child: Expression, vocab: Seq[String], maxLen: Int)
    extends UnaryExpression {

  require(vocab.forall(p => p.nonEmpty && p.length <= maxLen),
    s"vocab pieces must be 1..$maxLen chars")

  override def dataType: DataType = LongType
  override def prettyName: String = "subword_stats"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    Subword.segment(input.asInstanceOf[UTF8String].toString, vocabSet, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("subwordVocab", vocabSet,
      "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.Subword.segment($c.toString(), $setRef, $maxLen);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordStats =
    copy(child = newChild)
}

/** Array-of-pieces variant of [[SubwordStats]] — same greedy scan,
  * but materializes the piece strings (fallback single chars emit
  * as themselves), for vocabulary-utilization analysis. Split from
  * SubwordStats rather than parameterized: the counting form stays a
  * single packed long on the hot path; this form pays the array
  * allocation only where the pieces are actually consumed.
  */
case class SubwordPieces(child: Expression, vocab: Seq[String], maxLen: Int)
    extends UnaryExpression {

  require(vocab.forall(p => p.nonEmpty && p.length <= maxLen),
    s"vocab pieces must be 1..$maxLen chars")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "subword_pieces"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Subword.pieces(input.asInstanceOf[UTF8String].toString, vocabSet, maxLen)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("subwordVocab", vocabSet,
      "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.Subword.pieces($c.toString(), $setRef, $maxLen));
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordPieces =
    copy(child = newChild)
}

object Subword {

  /** Greedy longest-match over `word`: at each position try piece
    * lengths maxLen..1 against `vocab`; if none matches, advance one
    * character as a counted fallback piece. Returns
    * (nPieces << 32) | nFallback. Called from both the interpreted
    * and the generated path — one definition, no drift. */
  def segment(word: String, vocab: java.util.HashSet[String], maxLen: Int): Long = {
    var pos = 0
    var nPieces = 0L
    var nFallback = 0L
    val n = word.length
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var matched = 0
      while (l >= 1 && matched == 0) {
        if (vocab.contains(word.substring(pos, pos + l))) matched = l
        l -= 1
      }
      if (matched == 0) { nFallback += 1; matched = 1 }
      nPieces += 1
      pos += matched
    }
    (nPieces << 32) | nFallback
  }

  /** The same greedy scan as [[segment]], materializing the pieces.
    * One scan definition would force the counting path to allocate;
    * SubwordSpec pins the two paths against each other instead. */
  def pieces(word: String, vocab: java.util.HashSet[String], maxLen: Int)
      : Array[UTF8String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = 0
    val n = word.length
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var matched = 0
      while (l >= 1 && matched == 0) {
        if (vocab.contains(word.substring(pos, pos + l))) matched = l
        l -= 1
      }
      if (matched == 0) matched = 1 // fallback char emits as itself
      out += UTF8String.fromString(word.substring(pos, pos + matched))
      pos += matched
    }
    out.toArray
  }

  /** Column facade: packed (n_pieces << 32 | n_fallback). */
  def subword_stats(c: Column, vocab: Seq[String], maxLen: Int): Column =
    GraftShims.column(SubwordStats(GraftShims.expression(c.cast("string")),
      vocab, maxLen))

  /** Column facade: the ordered piece array. */
  def subword_pieces(c: Column, vocab: Seq[String], maxLen: Int): Column =
    GraftShims.column(SubwordPieces(GraftShims.expression(c.cast("string")),
      vocab, maxLen))
}
