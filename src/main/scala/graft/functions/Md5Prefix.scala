package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The catalog's deterministic hash-split key,
  * `CAST(CONV(SUBSTRING(MD5(s), 1, 8), 16, 10) AS BIGINT)`, computed
  * without materializing the 32-char hex string: the first 8 hex
  * characters of an MD5 digest ARE its first 4 bytes read as an
  * unsigned big-endian integer, so the value comes straight off the
  * digest. The SQL form pays, per row, a full hex-string render (32
  * chars), a substring copy, and CONV's radix parse — measured ~45%
  * of the expression's cost on the 600k-row q218 split leg; five
  * catalog queries (q101/q218/q225/q227/q228) evaluate it per corpus
  * row. The DuckDB oracles keep replaying the SQL spelling; value
  * identity is pinned byte-for-byte in Md5PrefixSpec and by those
  * oracles themselves.
  *
  * Native Catalyst expression with `doGenCode` (the [[PolyHash]]
  * pattern) so the split stays inside whole-stage codegen; the
  * MessageDigest instance is per-codegen-object mutable state, reused
  * across rows instead of re-looked-up per call.
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix32"

  private def prefix(bytes: Array[Byte]): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  override protected def nullSafeEval(input: Any): Any =
    prefix(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "md5md",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
               catch (java.security.NoSuchAlgorithmException e) {
                 throw new RuntimeException(e); }""")
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("digest")
      s"""
        byte[] $d = $md.digest($c.getBytes());
        ${ev.value} = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
          (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

object Md5Prefix {
  /** Column-API facade; the cast pins the child to StringType. */
  def md5_prefix32(c: Column): Column =
    GraftShims.column(Md5Prefix32(GraftShims.expression(c.cast("string"))))
}
