package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand traces for the ranking-metrics wave (q248 nDCG, q249
  * MRR/precision/recall, q250 RBO) — forced 2-dim cosine orderings
  * where DCG/MRR/RBO are pencil-and-paper numbers, plus the boundary
  * regimes the fixture can't exercise (perfect ranking, identical
  * rankers, engineered disjoint top-10s).
  */
class RankingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("ndcg: hand trace on a forced 3-candidate ordering") {
    // query (1,0) label 1; candidates ranked by falling cosine:
    //   rk1 (1,0.1) label 1, rk2 (1,0.3) label 0, rk3 (1,0.6) label 1
    // dcg = 1/log2(2) + 1/log2(4) = 1.5
    // R = 2 (query's class has 3 members, itself excluded)
    // idcg = 1 + 1/log2(3) = 1.63093 → ndcg = 0.9197
    val r = RankingQueries.ndcg(emb(Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0.1f), 1),
      (2L, Seq(1f, 0.3f), 0), (3L, Seq(1f, 0.6f), 1))),
      col("vec_id") === 0).collect().head
    assert(r.getLong(2) === 2)            // hits
    assert(r.getDouble(3) === 1.5)        // dcg
    assert(r.getDouble(4) === 1.6309)     // idcg
    assert(r.getDouble(5) === 0.9197)     // ndcg
  }

  test("ndcg: a perfect ranking scores 1") {
    // all 10 relevant candidates rank above every irrelevant one and
    // R = 10 exactly → dcg == idcg
    val rel = (1L to 10L).map(i => (i, Seq(1f, 0.01f * i), 1))
    val irr = (11L to 15L).map(i => (i, Seq(-1f, 0.01f * i), 0))
    val r = RankingQueries.ndcg(emb((0L, Seq(1f, 0f), 1) +: (rel ++ irr)),
      col("vec_id") === 0).collect().head
    assert(r.getLong(2) === 10)
    assert(r.getDouble(5) === 1.0)
  }

  test("retrieval metrics: first relevant at rank 2 gives MRR 1/2") {
    // rank1 label 0, rank2 label 1 (the only other class member)
    val r = RankingQueries.retrievalMetrics(emb(Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0.1f), 0),
      (2L, Seq(1f, 0.3f), 1))),
      col("vec_id") === 0).collect()
    val row = r.find(_.getInt(0) == 1).get
    assert(row.getLong(1) === 1)          // n_q
    assert(row.getDouble(2) === 0.5)      // mrr
    assert(row.getDouble(3) === 0.1)      // p@10: 1 hit of 10 slots
    assert(row.getDouble(4) === 1.0)      // recall: 1 of R=1
  }

  test("rbo: identical rankers normalize to 1") {
    // dim 2 < prefix 16 → the prefix ranking IS the full ranking
    val rows = (0L to 12L).map(i => (i, Seq(1f, 0.05f * i), 0))
    val r = RankingQueries.rbo(emb(rows), col("vec_id") === 0, 16)
      .collect().head
    assert(r.getLong(1) === 10)           // overlap10
    assert(r.getDouble(3) === 1.0)        // rbo_norm
    // raw truncated RBO ceiling is 1 - 0.9^10
    assert(r.getDouble(2) === math.round((1 - math.pow(0.9, 10)) * 1e4) / 1e4)
  }

  test("rbo: engineered disjoint top-10s score 0") {
    // query has mass at dim 0 (prefix) and dim 16 (beyond prefix).
    // A-candidates align with the prefix but cancel at dim 16 → full
    // cosine 0, prefix cosine ≈ 1. B-candidates are orthogonal to the
    // prefix but share dim 16 → full cosine > 0, prefix cosine 0.
    // Full top-10 = the 10 Bs, prefix top-10 = the 10 As: disjoint.
    val qv = Seq.tabulate(17)(j => if (j == 0 || j == 16) 1f else 0f)
    val as = (1L to 10L).map { i =>
      (i, Seq.tabulate(17)(j =>
        if (j == 0) 1f else if (j == 1) 0.01f * i
        else if (j == 16) -1f else 0f), 0)
    }
    val bs = (11L to 20L).map { i =>
      (i, Seq.tabulate(17)(j =>
        if (j == 1) 0.01f * i else if (j == 16) 1f else 0f), 0)
    }
    val r = RankingQueries.rbo(emb((0L, qv, 0) +: (as ++ bs)),
      col("vec_id") === 0, 16).collect().head
    assert(r.getLong(1) === 0)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === 0.0)
  }
}
