package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables
import graft.text.Dedup

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("q132 semantic dedup: one keeper per component, dup pairs co-grouped") {
    val d = SparkTestSession.Sf0001
    val rows = CurationQueries.q132SemanticDedup.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length === Tables.embeddings(spark, d).count())
    // keeper iff vec_id == component; exactly one keeper per component
    rows.foreach { case (v, c, k) =>
      assert(k === (if (v == c) 1 else 0)); assert(c <= v)
    }
    val byComp = rows.groupBy(_._2)
    byComp.values.foreach(g => assert(g.count(_._3 == 1) === 1))
    // every near-dup pair must land in the same component
    val comp = rows.map(r => r._1 -> r._2).toMap
    Dedup.embeddingDupPairs(Tables.embeddings(spark, d), 0.4)
      .select("vec_a", "vec_b").collect()
      .foreach(r => assert(comp(r.getLong(0)) === comp(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} split across components"))
  }

  test("q133 token budget: kept set is a hash-order prefix under budget, per source") {
    val d = SparkTestSession.Sf0001
    val kept = CurationQueries.q133TokenBudget.run(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    // recompute the contract per source from the raw corpus
    val docs = Tables.documents(spark, d)
      .select(col("source"), col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("tok"),
        substring(md5(col("doc_id").cast("string")), 1, 8).as("hk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = docs.toList.groupBy(_._1).flatMap { case (src, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      val cums = ordered.scanLeft(0L)(_ + _._3).init
      ordered.zip(cums).takeWhile(_._2 < CurationQueries.SourceBudget)
        .map { case (r, c) => (src, r._2, r._3, c) }
    }.toSet
    assert(kept.toSet === expect, "kept set must equal the per-source prefix")
    // the budget genuinely binds: something was cut
    assert(kept.length < docs.length, "budget should exclude some documents")
  }
}
