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

  test("q134 incremental admission agrees with the symmetric pair ground truth") {
    val d = SparkTestSession.Sf0001
    val out = CurationQueries.q134IncrementalAdmission.run(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    // ground truth from the SYMMETRIC pair list: an incoming doc must be
    // rejected iff some pair at the threshold straddles the batch split,
    // and its match must be the best (max jaccard, min id) existing side
    val straddle = Dedup.jaccardPairs(Tables.documents(spark, d), 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        Seq((a, b, j), (b, a, j)).collect {
          case (in, ex, jj) if in % 5 == 0 && ex % 5 != 0 => (in, ex, jj)
        }
      }
    val bestByDoc = straddle.groupBy(_._1).map { case (in, ms) =>
      in -> ms.maxBy(m => (m._3, -m._2))
    }
    out.foreach { case (id, (status, dupOf, jac)) =>
      bestByDoc.get(id) match {
        case Some((_, ex, jj)) =>
          assert(status === "reject" && dupOf === Some(ex) && jac === Some(jj),
            s"doc $id: expected reject/$ex/$jj, got $status/$dupOf/$jac")
        case None =>
          assert(status === "admit" && dupOf.isEmpty && jac.isEmpty,
            s"doc $id: expected admit, got $status/$dupOf")
      }
    }
    assert(out.keySet === Tables.documents(spark, d)
      .where(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
      .collect().map(_.getAs[Long]("doc_id")).toSet)
  }

  test("q135 LM scoring: OOV tokens smoothed, hand-computed NLL, trusted-only vocab") {
    import spark.implicits._
    // trusted slice: "a b b"; scored docs: one in-vocab, one with OOV
    val docs = Seq(
      (0L, "src0", "a b b"),     // trusted; trains the LM: T=3, V=2
      (1L, "src1", "a b"),       // all in-vocab
      (2L, "src1", "a zz qq"))   // two OOV tokens
      .toDF("doc_id", "source", "text")
    val got = CurationQueries.lmScore(docs,
        isTrusted = org.apache.spark.sql.functions.col("source") === "src0")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // Laplace with T=3, V=2: p(a)=(1+1)/5, p(b)=(2+1)/5, p(oov)=1/5
    def nll(ps: Seq[Double]) =
      BigDecimal(-ps.map(math.log).sum / ps.size + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((2L, 0L, nll(Seq(2.0 / 5, 3.0 / 5)))))
    assert(got(2L) === ((3L, 2L, nll(Seq(2.0 / 5, 1.0 / 5, 1.0 / 5)))))
    // OOV must cost MORE than any in-vocab token of the same corpus
    assert(got(2L)._3 > got(1L)._3)
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
