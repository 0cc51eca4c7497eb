package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb = Tables.embeddings(spark, SparkTestSession.Sf0001)

  test("PQ codebooks cover every subspace with k centroids of subDim width") {
    val cb = Pq.trainCodebooks(emb, m = 8, k = 4)
    assert(cb.count() === 32)
    val shape = cb.select(col("sub"), size(col("cent")).as("w")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(shape.keySet === (0 until 8).toSet)
    assert(shape.values.toSet === Set(8)) // dim 64 / m 8
  }

  test("encode emits one in-range code per subspace, deterministically") {
    val cb = Pq.trainCodebooks(emb, m = 8, k = 4)
    val codes = Pq.encode(emb, cb, m = 8)
    assert(codes.count() === emb.count())
    val bad = codes.where(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 4)).count()
    assert(bad === 0)
    val a = codes.orderBy("vec_id").collect().map(_.toString)
    val b = Pq.encode(emb, cb, m = 8).orderBy("vec_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("ADC distance equals exact distance to the decoded reconstruction") {
    // The identity that makes ADC sound: summing per-subspace
    // query→centroid distances IS the full-vector distance to the
    // reconstruction, because subspaces partition the coordinates.
    val cb = Pq.trainCodebooks(emb, m = 8, k = 16)
    val codes = Pq.encode(emb, cb, m = 8)
    val recon = Pq.decode(codes, cb)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
        Similarity.toDouble(col("embedding")).as("qv"))
    import graft.functions.VectorOps.dot_product
    val exactToRecon = queries.crossJoin(recon)
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        (dot_product(col("qv"), col("qv")) -
          lit(2.0) * dot_product(col("qv"), col("recon")) +
          dot_product(col("recon"), col("recon"))).as("d2"))
    val adc = Pq.adcTopK(emb, col("vec_id") < 5, k = Int.MaxValue, m = 8)
    val diff = adc.join(exactToRecon, Seq("q_id", "vec_id"))
      .select(max(abs(col("adc") - round(col("d2"), 4))).as("md"))
      .head.getDouble(0)
    assert(diff <= 2e-4, s"ADC deviates from reconstruction distance by $diff")
  }

  test("PQ index survives the table layout: write codes+codebook, query from disk") {
    // The index IS table data (codes column + m×k codebook table), so
    // the offline build / online query split is just parquet IO — no
    // side-format, no serialization code to maintain.
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    val cb = Pq.trainCodebooks(emb, m = 8, k = 16)
    Pq.encode(emb, cb, m = 8).write.parquet(s"$dir/codes")
    cb.write.parquet(s"$dir/codebook")
    val cb2 = spark.read.parquet(s"$dir/codebook")
    val codes2 = spark.read.parquet(s"$dir/codes")
    // decode from the persisted pair reproduces the in-memory recon
    val a = Pq.decode(Pq.encode(emb, cb, 8), cb).orderBy("vec_id")
      .collect().map(_.toString)
    val b = Pq.decode(codes2, cb2).orderBy("vec_id")
      .collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("PQ handles production dims (768) without plan blowup") {
    // The r1 lesson that killed the literal-tree LSH buckets at dim
    // 768: per-dimension expression trees explode codegen. PQ's plans
    // are dimension-INDEPENDENT (slice + native dot products + joins),
    // so the same code must run unchanged at real embedding widths.
    import org.apache.spark.sql.functions._
    val emb768 = spark.range(256).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 768), j -> cast(sin(id * 7 + j) as float))")
        .as("embedding"))
    val cb = Pq.trainCodebooks(emb768, m = 16, k = 16)
    assert(cb.count() === 256)
    assert(cb.select(size(col("cent"))).distinct().head.getInt(0) === 48)
    val top = Pq.adcRerankTopK(emb768, col("vec_id") < 8, k = 5, m = 16)
      .collect()
    assert(top.length === 40) // 8 queries × top-5
  }

  test("ADC recall vs exact L2; shortlist+re-rank lifts it substantially") {
    // Fixture embeddings are near-random 64-dim vectors — the
    // distance-concentration worst case for an 8-byte code. The pins:
    // the raw compressed scan still beats chance by far, and the
    // production read path (shortlist 50/500 + exact re-rank) recovers
    // most of the exact top-5. Deterministic: seeded KMeans.
    val isQ = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Pq.l2TopK(emb, isQ, 5))
    val adcOnly = pairs(Pq.adcTopK(emb, isQ, 5, m = 8))
    val reranked = pairs(Pq.adcRerankTopK(emb, isQ, 5, m = 8, shortlist = 50))
    val rAdc = adcOnly.intersect(exact).size.toDouble / exact.size
    val rRer = reranked.intersect(exact).size.toDouble / exact.size
    // chance: 5 of 499 candidates ≈ 0.01
    assert(rAdc >= 0.15, s"raw ADC recall $rAdc at chance level")
    assert(rRer >= 0.6, s"re-ranked recall $rRer too low for 10% shortlist")
    assert(rRer >= rAdc, "re-ranking must not lose recall")
  }

  test("re-ranked recall >= 0.9 on planted clusters") {
    // The near-random bound above is the worst-case floor; on clustered
    // data (the regime PQ serves in production) the shortlist+re-rank
    // path must recover the exact top-5 almost perfectly.
    val cemb = ClusteredEmbeddings.fixture(spark)
    val isQ = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Pq.l2TopK(cemb, isQ, 5))
    val rAdc = pairs(Pq.adcTopK(cemb, isQ, 5, m = 8))
      .intersect(exact).size.toDouble / exact.size
    val rRer = pairs(Pq.adcRerankTopK(cemb, isQ, 5, m = 8, shortlist = 50))
      .intersect(exact).size.toDouble / exact.size
    assert(rAdc >= 0.3, s"clustered raw ADC recall $rAdc (measured 0.42)")
    assert(rRer >= 0.9, s"clustered re-ranked recall $rRer (measured 1.0)")
  }
}
