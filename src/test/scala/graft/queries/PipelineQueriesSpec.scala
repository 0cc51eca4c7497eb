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
