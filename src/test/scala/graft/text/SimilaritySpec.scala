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

  test("lshCosineTopK recall >= 0.9 on planted clusters") {
    // the near-random fixture above is the worst case; on clustered
    // data (what sign-LSH actually serves) recall must be near-perfect
    val cemb = ClusteredEmbeddings.fixture(spark)
    val isQ = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(cemb, isQ, 5))
    val approx = pairs(
      Similarity.lshCosineTopK(cemb, isQ, 5, dim = 64, planes = 4, tables = 8))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered recall $recall (measured 1.0)")
  }

  test("quantizedCosineTopK keeps high recall vs full precision") {
    val emb = Tables.embeddings(spark, SparkTestSession.Sf0001)
    val isQ = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, isQ, 5))
    val quant = pairs(Similarity.quantizedCosineTopK(emb, isQ, 5))
    val recall = quant.intersect(exact).size.toDouble / exact.size
    // int8 shifts cosines by ~1e-3 — only near-ties can swap in/out of
    // the top-5, so recall must stay near-perfect (far tighter than LSH)
    assert(recall >= 0.9, s"int8 recall $recall too low")
  }

  test("native lshBucket matches the literal-tree form on fixtures") {
    val emb = Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = emb.select(col("vec_id"),
        Similarity.lshBucket(col("v"), 64, 4, 3).as("native"),
        Similarity.lshBucketLiteral(col("v"), 64, 4, 3).as("literal"))
      .filter(col("native") =!= col("literal"))
    assert(both.count() === 0)
  }

  test("lshBucket stays in codegen at dim=768 (no literal blowup)") {
    // 768-dim vectors: the literal-tree form would generate 768×8 nodes
    // per bucket column; the native expression is O(1) nodes with the
    // matrix as a reference object. Assert the plan compiles into
    // WholeStageCodegen and produces sane buckets. Round-trip through
    // parquet: a local relation would be pre-evaluated by
    // ConvertToLocalRelation and show no plan at all, and a transform()
    // lambda in the plan would itself be CodegenFallback.
    val dir = s"${sys.props("java.io.tmpdir")}/graft_dim768_probe"
    (0L until 200L).map { id =>
      (id, Array.tabulate(768)(j => math.sin(id * 31.0 + j)))
    }.toDF("vec_id", "v").write.mode("overwrite").parquet(dir)
    val wide = spark.read.parquet(dir)
    val bucketed = wide.select(col("vec_id"),
      Similarity.lshBucket(col("v"), 768, 8, 0).as("b"))
    val plan = bucketed.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in treeString form
    assert(plan.contains("*(1) Project"), s"projection not codegen'd in:\n$plan")
    val n = bucketed.select(countDistinct(col("b"))).as[Long].head()
    assert(n > 1, "buckets should spread across multiple ids")
  }
}
