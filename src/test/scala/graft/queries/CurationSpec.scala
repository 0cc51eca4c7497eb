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

  test("EmbeddingPairsLayout read-back equals both direct pair derivations") {
    val d = SparkTestSession.Sf0001
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val emb = Tables.embeddings(spark, d)
    assert(rows(graft.sources.EmbeddingPairsLayout.exactPairs(spark, d, 0.4))
        === rows(Dedup.embeddingDupPairs(emb, 0.4)),
      "write-once exact pair layout must be value-identical to the live derivation")
    assert(rows(graft.sources.EmbeddingPairsLayout.lshPairs(spark, d, 0.4, dim = 64))
        === rows(Dedup.embeddingDupPairsLsh(emb, 0.4, dim = 64)),
      "write-once LSH pair layout must be value-identical to the live derivation")
    // and one level down the chain: the component layouts equal the
    // star-round fixed point over the live pair derivations
    def cc(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def direct(pairs: org.apache.spark.sql.DataFrame) =
      cc(graft.text.Components.connectedComponents(
        pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))))
    assert(cc(graft.sources.EmbeddingPairsLayout.exactComponents(spark, d, 0.4))
        === direct(Dedup.embeddingDupPairs(emb, 0.4)),
      "exact component layout must equal the live fixed point")
    assert(cc(graft.sources.EmbeddingPairsLayout.lshComponents(spark, d, 0.4, dim = 64))
        === direct(Dedup.embeddingDupPairsLsh(emb, 0.4, dim = 64)),
      "LSH component layout must equal the live fixed point")
  }

  test("q144 LSH semantic dedup: >= 0.9 per-vector parity with the exact twin") {
    import graft.text.ClusteredEmbeddings
    val emb = ClusteredEmbeddings.fixture(spark)
    def grouping(pairs: org.apache.spark.sql.DataFrame) =
      CurationQueries.semanticDedup(emb, pairs).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val exact = grouping(Dedup.embeddingDupPairs(emb, 0.4))
    val lsh = grouping(Dedup.embeddingDupPairsLsh(emb, 0.4, dim = 64))
    assert(lsh.size === exact.size)
    // the LSH pair source loses only threshold-grazing pairs; on the
    // planted clusters the components it builds must agree with the
    // exact twin's (component id AND keeper flag) on >= 90% of vectors
    val matching = exact.count { case (id, ck) => lsh(id) == ck }
    val parity = matching.toDouble / exact.size
    assert(parity >= 0.9, s"LSH/exact grouping parity $parity < 0.9")
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

  test("q136 boilerplate: coverage bounds + total positions conserved") {
    val d = SparkTestSession.Sf0001
    val rows = CurationQueries.q136Boilerplate.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, b, f) =>
      assert(b >= 0 && b <= n, s"doc $id: n_boiler $b outside [0, $n]")
      assert(f >= 0.0 && f <= 1.0, s"doc $id: frac $f outside [0,1]")
      assert(math.abs(f - b.toDouble / n) <= 5.01e-5, // half-ulp of 4 dp
        s"doc $id: frac $f drifts from $b/$n")
    }
    // every 3-gram position of every (>=3-token) doc is accounted for
    val totalPositions = Dedup.positionalShingles(
      Tables.documents(spark, d)).count()
    assert(rows.map(_._2).sum === totalPositions,
      "per-doc gram counts must sum to the corpus positional total")
  }

  test("q139 source overlap: full matrix, symmetric-free, sane jaccard") {
    val d = SparkTestSession.Sf0001
    val rows = CurationQueries.q139SourceOverlap.run(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val sources = Tables.documents(spark, d).select(col("source"))
      .distinct().collect().map(_.getString(0)).toSet
    // fixture sources share one vocabulary, so every pair overlaps and
    // the matrix is complete: S*(S-1)/2 rows, each ordered src_a < src_b
    assert(rows.length === sources.size * (sources.size - 1) / 2)
    rows.foreach { case (a, b, inter, j) =>
      assert(a < b, s"pair ($a,$b) not canonically ordered")
      assert(inter > 0 && j > 0.0 && j <= 1.0, s"($a,$b) inter=$inter j=$j")
    }
  }

  test("q140 dedup yield: docs conserved, token accounting matches q68 keepers") {
    val d = SparkTestSession.Sf0001
    val hist = CurationQueries.q140DedupYield.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = Tables.documents(spark, d)
    assert(hist.map(_._3).sum === docs.count(), "histogram covers every doc")
    // singletons drop nothing
    hist.filter(_._1 == 1).foreach { case (_, _, _, _, dropped) =>
      assert(dropped === 0L, "size-1 components must drop no tokens")
    }
    // kept tokens (total - dropped) equal the token mass of q68's keepers
    val keptTokens = hist.map(h => h._4 - h._5).sum
    val keeperIds = PipelineQueries.q68DedupCorpus.run(spark, d).collect()
      .map(_.getLong(0)).toSet
    val keeperTokens = docs
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
      .collect().filter(r => keeperIds(r.getLong(0))).map(_.getLong(1)).sum
    assert(keptTokens === keeperTokens,
      s"kept token mass $keptTokens must equal q68 keeper mass $keeperTokens")
    // and the number of components equals the number of keepers
    assert(hist.map(_._2).sum === keeperIds.size)
  }

  test("q281 ablation: dropping the junk source improves both readouts") {
    import spark.implicits._
    // 'junk': 5 identical stopword-free two-word docs (4 redundant
    // copies, low quality). 'good': 5 distinct stopword-rich docs.
    // full dup rate = 4/10; LOO(junk) = 0/5; LOO(good) = 4/5.
    val junk = (1L to 5L).map(i => (i, "zzz qqq", "junk"))
    val good = (11L to 15L).map(i =>
      (i, s"the quick fox $i jumps over the lazy dog and it is fine",
        "good"))
    val r = CurationQueries.sourceAblation(
      (junk ++ good).toDF("doc_id", "text", "source")).collect()
      .map(x => x.getString(0) -> x).toMap
    val j = r("junk"); val g = r("good")
    assert(j.getDouble(5) === 0.4)      // full dup rate
    assert(j.getDouble(6) === 0.0)      // without junk: no dups
    assert(j.getDouble(7) === -0.4)     // dup_delta
    assert(g.getDouble(6) === 0.8)      // without good: 4 dups over 5
    assert(j.getDouble(4) > 0,  "dropping junk raises mean quality")
    assert(g.getDouble(4) < 0,  "dropping good lowers it")
  }
}
