package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables

class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("IVF index partitions the corpus into cells completely") {
    val emb = Tables.embeddings(spark, SparkTestSession.Sf0001)
    val (indexed, centroids) = Ivf.buildIndex(emb, nCells = 8)
    assert(indexed.count() === emb.count())
    assert(centroids.count() === 8)
    val cells = indexed.select("cell").distinct().count()
    assert(cells > 1 && cells <= 8)
  }

  test("cellsFor resolves to the legacy 16 at fixture scale and scales as sqrt(n)/4 beyond") {
    // fixture regime: identical geometry to the historical fixed 16 —
    // no layout churn, no recall-pin churn (the lshPlanesFor pattern)
    Seq(40L, 500L, 2000L, 4096L).foreach(n =>
      assert(Ivf.cellsFor(n) === 16, s"n=$n"))
    // growth regime: quarter-sqrt, monotone
    assert(Ivf.cellsFor(32_000L) === 44)
    assert(Ivf.cellsFor(128_000L) === 89)
    assert(Ivf.cellsFor(1_000_000_000L) === 7905)
    val pts = Seq(4096L, 10_000L, 100_000L, 10_000_000L, 1_000_000_000_000L)
      .map(Ivf.cellsFor)
    assert(pts === pts.sorted, s"cellsFor must be monotone: $pts")
    // broadcastability cap: the centroid table never exceeds 65536 rows
    assert(Ivf.cellsFor(Long.MaxValue) === 65536)
  }

  test("IVF top-k recall beats its probe fraction and full-probe is exact") {
    val emb = Tables.embeddings(spark, SparkTestSession.Sf0001)
    val isQ = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, isQ, 5))
    val ivf = pairs(Ivf.ivfCosineTopK(emb, isQ, 5, nCells = 8, nProbe = 3))
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low for 3/8 probes")
    // probing every cell must reproduce brute force exactly
    val full = pairs(Ivf.ivfCosineTopK(emb, isQ, 5, nCells = 8, nProbe = 8))
    assert(full === exact)
  }

  test("a zero-norm query scores -1.0 and stays in the output (q141 convention)") {
    import spark.implicits._
    // orderBy before limit: a bare limit() is only deterministic while
    // the scan stays single-partition, and nothing pins that here
    val emb = Tables.embeddings(spark, SparkTestSession.Sf0001)
      .orderBy(col("vec_id")).limit(40)
      .union(Seq((9999L, Array.fill(64)(0.0f), 0))
        .toDF("vec_id", "embedding", "label"))
    val out = Ivf.ivfCosineTopK(emb, col("vec_id") === 9999L, k = 3,
      nCells = 4, nProbe = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // the degenerate query must not vanish: k rows, every score -1.0,
    // tie-broken by smallest neighbor id
    assert(out.length === 3, s"zero-norm query dropped: ${out.length} rows")
    assert(out.forall(_._2 === -1.0), out.mkString(","))
    assert(out.map(_._1).toSeq === out.map(_._1).sorted.toSeq)
  }

  test("IVF recall >= 0.9 on planted clusters (the structure it exists to exploit)") {
    val emb = ClusteredEmbeddings.fixture(spark)
    val isQ = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, isQ, 5))
    val ivf = pairs(Ivf.ivfCosineTopK(emb, isQ, 5, nCells = 16, nProbe = 4))
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered recall $recall — the index missed " +
      "structure it is designed for (measured 1.0 at authoring)")
  }
}
