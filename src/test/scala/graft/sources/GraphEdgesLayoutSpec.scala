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
}
