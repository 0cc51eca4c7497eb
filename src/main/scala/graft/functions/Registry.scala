package graft.functions

import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** SQL registration for graft's native expressions, so `spark.sql`
  * users get them too: `SELECT rolling_min_hash(text, 16)`,
  * `SELECT top_k_by(price, id, 3)`.
  *
  * Two delivery paths share the same builder table:
  *  - [[registerAll]] — session-scoped temp functions (library call);
  *  - [[graft.GraftExtensions]] — builder-time injection via
  *    `spark.sql.extensions=graft.GraftExtensions`, the packaged path a
  *    cluster admin configures once (reference's SQL-first entry,
  *    music.md:45,83-86).
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

  private def litBytes(e: Expression, what: String): Array[Byte] = e match {
    case other if other.foldable =>
      other.eval() match {
        case b: Array[Byte] => b
        case x => throw new IllegalArgumentException(
          s"$what must be a binary literal, got $x")
      }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  // the SQL path must apply the same input casts the Scala facades do
  // (score.cast("double"), payload.cast("long"), text.cast("string")):
  // the expressions declare no inputTypes, so an un-cast INT column
  // reaches asInstanceOf[Long]/[UTF8String] and every task dies with
  // ClassCastException
  private def asLong(e: Expression): Expression =
    Cast(e, org.apache.spark.sql.types.LongType)
  private def asDouble(e: Expression): Expression = Cast(e, DoubleType)
  private def asString(e: Expression): Expression =
    Cast(e, org.apache.spark.sql.types.StringType)

  /** name → expression builder, shared by both registration paths. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_min_hash" -> (exprs =>
      RollingMinHash(asString(exprs.head), litInt(exprs(1), "window size"))),
    "poly_hash" -> (exprs =>
      PolyHash(asString(exprs.head))),
    "top_k_by" -> (exprs =>
      TopKByScore(asDouble(exprs(0)), asLong(exprs(1)), litInt(exprs(2), "k"))
        .toAggregateExpression()),
    "dot_product" -> (exprs =>
      DotProduct(asVec(exprs(0)), asVec(exprs(1)))),
    "l2_norm" -> (exprs =>
      L2Norm(asVec(exprs.head))),
    "simhash_agg" -> (exprs =>
      SimHashAgg(asLong(exprs.head)).toAggregateExpression()),
    "min_hash_agg" -> (exprs =>
      MinHashAgg(asLong(exprs(0)), litInt(exprs(1), "k")).toAggregateExpression()),
    "sign_projection_bucket" -> (exprs =>
      SignProjectionBucket(asVec(exprs(0)), litInt(exprs(3), "table"),
        litInt(exprs(2), "planes"), litInt(exprs(1), "dim"))),
    "int8_round_trip" -> (exprs =>
      Int8RoundTrip(asVec(exprs.head))),
    "jaro_winkler" -> (exprs =>
      JaroWinkler(asString(exprs(0)), asString(exprs(1)))),
    "damerau_levenshtein" -> (exprs =>
      DamerauLevenshtein(asString(exprs(0)), asString(exprs(1)))),
    "z_order_key" -> (exprs =>
      ZOrderKey(Cast(exprs(0), org.apache.spark.sql.types.LongType),
        Cast(exprs(1), org.apache.spark.sql.types.LongType))),
    // sketch probes: the sketch rides as a binary literal (X'…' /
    // a bound parameter), e.g. built by count_min_sketch(...) /
    // DataFrameStatFunctions.bloomFilter and re-attached to the scan
    "cms_estimate" -> (exprs =>
      CmsEstimate(Cast(exprs(0), org.apache.spark.sql.types.LongType),
        litBytes(exprs(1), "cms sketch"))),
    "bloom_might_contain" -> (exprs =>
      BloomMightContain(Cast(exprs(0), org.apache.spark.sql.types.LongType),
        litBytes(exprs(1), "bloom sketch"))))

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftShims.registerFunction(spark, name, b)
    }
}
