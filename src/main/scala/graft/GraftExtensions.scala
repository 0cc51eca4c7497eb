package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Builder-time injection of graft's native SQL functions — configure
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and every session in
  * the cluster resolves `top_k_by`, `dot_product`, `rolling_min_hash`,
  * `simhash_agg`, `l2_norm`, `sign_projection_bucket` in plain SQL text
  * — the packaged equivalent of the reference's register-then-%sql
  * workflow (music.md:45,83-86,548-552). Shares the builder table with
  * the session-scoped [[graft.functions.Registry.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Registry.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
