package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic invariants of the round-3 pipeline wave that the DuckDB
  * oracle can't express (determinism across runs, distribution shape,
  * conservation laws). Value-level checks live in the oracle compare. */
class PipelineQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(name: String) =
    Catalog.all.find(_.name == name).get.run(spark, SparkTestSession.Sf0001)

  test("ComponentLayout read-back equals the direct dedupComponents build") {
    val d = SparkTestSession.Sf0001
    val direct = graft.text.Components
      .dedupComponents(graft.model.Tables.documents(spark, d), 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val layout = graft.sources.ComponentLayout.dedupComponents(spark, d, 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(layout === direct,
      "the write-once layout must be value-identical to the in-query build")
  }

  test("q59 hash sample is identical across runs (reproducible corpus)") {
    val a = run("q59_hash_sample").collect().toSeq
    val b = run("q59_hash_sample").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty && a.size < 500)
  }

  test("q60 weighted mix: full-rate sources keep everything, rates order") {
    val rows = run("q60_weighted_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.size === 20)
    rows.foreach { case (src, total, kept) =>
      assert(kept <= total)
      val tier = src.drop(3).toInt % 4
      if (tier == 0) assert(kept === total, s"$src is a rate-1.0 source")
    }
    // aggregate kept fraction per tier must fall with the rate
    val byTier = rows.groupBy(_._1.drop(3).toInt % 4)
      .view.mapValues(g => g.map(_._3).sum.toDouble / g.map(_._2).sum).toMap
    assert(byTier(0) > byTier(1) && byTier(1) > byTier(2))
  }

  test("q62 deciles: all 10 present, near-balanced, price-monotone") {
    val rows = run("q62_decile_bucket").collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    val byDecile = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byDecile.keySet === (1 to 10).toSet)
    val n = rows.length
    byDecile.values.foreach(v =>
      assert(math.abs(v.size - n / 10.0) < n * 0.02, "deciles must balance"))
    (1 to 9).foreach { d =>
      assert(byDecile(d).max <= byDecile(d + 1).min + 2e-6,
        s"decile $d overlaps ${d + 1}")
    }
  }

  test("q61 keeper groups conserve the corpus") {
    val rows = run("q61_keeper_select").collect()
    val docs = run("q25_exact_dedup")
    assert(rows.map(_.getLong(3)).sum === 500L) // every doc in exactly one group
    assert(rows.length === docs.count())        // same groups as q25
  }

  test("q68 dedup corpus: one keeper per component, no surviving near-dup pair") {
    import org.apache.spark.sql.functions._
    val rows = run("q68_dedup_corpus").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one survivor per component
    assert(rows.map(_._2).distinct.length === rows.length)
    // members add back up to the corpus
    assert(rows.map(_._3).sum === 500L)
    // no near-dup pair survives: both ends of any >=0.4 pair can't be kept
    val docs = graft.model.Tables.documents(spark, SparkTestSession.Sf0001)
    val kept = rows.map(_._1).toSet
    val pairs = graft.text.Dedup.jaccardPairs(docs, 0.4)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"near-dup pair ($a,$b) both survived")
    }
  }

  test("q69 chunks cover every token with stride-24 starts") {
    val rows = run("q69_chunking").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    import org.apache.spark.sql.functions._
    val nTokens = graft.model.Tables.documents(spark, SparkTestSession.Sf0001)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nTokens(doc)
      val sorted = cs.sortBy(_._2)
      // chunk ids are dense from 0; starts at stride 24 cover [0, n)
      assert(sorted.map(_._2).toSeq === sorted.indices.toSeq)
      assert(sorted.length === (n + 23) / 24)
      // every chunk holds min(32, n - start) tokens; text agrees
      sorted.foreach { case (_, id, len, text) =>
        assert(len === math.min(32, n - id * 24))
        assert(text.split(" ").length === len)
      }
    }
  }

  test("q70 split partitions the corpus at roughly 80/10/10") {
    val rows = run("q70_hash_split").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(rows.length === 500)
    val by = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(by.keySet === Set("train", "val", "test"))
    assert(by("train") > 350 && by("train") < 450)
    assert(by("val") > 20 && by("test") > 20)
    // deterministic across runs
    val again = run("q70_hash_split").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("q58 bm25 scores are positive and only for docs containing a term") {
    val scored = run("q58_bm25").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.values.forall(_ > 0))
    import org.apache.spark.sql.functions._
    val containing = graft.model.Tables.documents(spark, SparkTestSession.Sf0001)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .filter(col("term").isin("spark", "filter", "stream"))
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(scored.keySet === containing)
  }
}
