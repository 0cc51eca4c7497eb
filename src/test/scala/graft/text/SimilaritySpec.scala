package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosineTopK ranks hand-built vectors correctly") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // query
      (1L, Array(0.9f, 0.1f)),   // closest
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.0f, 1.0f)))   // orthogonal
      .toDF("vec_id", "embedding")
    val got = Similarity.cosineTopK(emb, col("vec_id") === 0, 3)
      .orderBy("rk").select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L, 3L))
  }

  test("lshCosineTopK reaches useful recall vs brute force on fixtures") {
    val emb = Tables.embeddings(spark, SparkTestSession.Sf0001)
    val isQ = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, isQ, 5))
    val approx = pairs(
      Similarity.lshCosineTopK(emb, isQ, 5, dim = 64, planes = 4, tables = 8))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    // 8 OR-amplified tables × 4 planes: recall is data-dependent but must
    // be far above random; brute force stays the exact path
    assert(recall >= 0.5, s"recall $recall too low")
    assert(approx.subsetOf(pairs(Similarity.cosineTopK(emb, isQ, 500))),
      "approx neighbors must still be real corpus vectors")
  }
}
