package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables

class GraphEdgesLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("read-back equals the direct DISTINCT (suppkey, partkey) derivation") {
    val d = SparkTestSession.Sf0001
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.get(0).toString, r.get(1).toString)).toSet
    val direct = rows(Tables.lineitem(spark, d)
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct())
    val layout = rows(GraphEdgesLayout.supplierPart(spark, d))
    assert(layout === direct,
      "the write-once edge layout must be value-identical to the in-query derivation")
    assert(GraphEdgesLayout.supplierPart(spark, d).columns.toSeq === Seq("s", "p"))
  }

  test("degree layout equals the per-query degree derivation it replaces") {
    val d = SparkTestSession.Sf0001
    import org.apache.spark.sql.functions.{count, lit}
    val pairs = Tables.lineitem(spark, d)
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
    val sd = pairs.groupBy(col("s")).agg(count(lit(1)).as("sdeg"))
    val pd = pairs.groupBy(col("p")).agg(count(lit(1)).as("pdeg"))
    val direct = pairs.join(sd, "s").join(pd, "p")
      .select(col("s"), col("p"), col("sdeg"), col("pdeg"))
      .collect().map(r => (r.get(0).toString, r.get(1).toString,
        r.getLong(2), r.getLong(3))).toSet
    val layout = GraphEdgesLayout.supplierPartDegrees(spark, d)
      .collect().map(r => (r.get(0).toString, r.get(1).toString,
        r.getLong(2), r.getLong(3))).toSet
    assert(layout === direct,
      "stored degrees must equal the groupBy+join derivation they replace")
  }

  test("node layout is one row per node with the symmetrized outdegree") {
    val d = SparkTestSession.Sf0001
    val w = GraphEdgesLayout.supplierPartDegrees(spark, d)
    val directS = w.select(col("s"), col("sdeg")).distinct()
      .collect().map(r => (1, r.get(0).toString, r.getLong(1))).toSet
    val directP = w.select(col("p"), col("pdeg")).distinct()
      .collect().map(r => (0, r.get(0).toString, r.getLong(1))).toSet
    val layout = GraphEdgesLayout.nodes(spark, d)
      .collect().map(r => (r.getInt(0), r.get(1).toString, r.getLong(2))).toSet
    assert(layout === (directS ++ directP),
      "the node table must hold every endpoint exactly once with its degree")
  }
}
