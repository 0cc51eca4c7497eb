package graft.functions

import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** SQL registration for graft's native expressions, so `spark.sql`
  * users get them too: `SELECT rolling_min_hash(text, 16)`,
  * `SELECT top_k_by(price, id, 3)`. Session-scoped.
  */
object Registry {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other if other.foldable =>
      other.eval() match {
        case i: Int => i
        case x => throw new IllegalArgumentException(s"$what must be an int literal, got $x")
      }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  private def asVec(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  def registerAll(spark: SparkSession): Unit = {
    GraftShims.registerFunction(spark, "rolling_min_hash", exprs =>
      RollingMinHash(exprs.head, litInt(exprs(1), "window size")))
    GraftShims.registerFunction(spark, "top_k_by", exprs =>
      TopKByScore(exprs(0), exprs(1), litInt(exprs(2), "k"))
        .toAggregateExpression())
    GraftShims.registerFunction(spark, "dot_product", exprs =>
      DotProduct(asVec(exprs(0)), asVec(exprs(1))))
    GraftShims.registerFunction(spark, "l2_norm", exprs =>
      L2Norm(asVec(exprs.head)))
  }
}
