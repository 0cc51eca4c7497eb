package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Every catalog query executes at sf0.001 (driver t1-smoke analogue);
  * oracle-level value checks run in the driver's t2 harness
  * (tools/check_oracle.py locally). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // may legitimately return zero rows on the tiny fixture
  private val mayBeEmpty = Set("q18_except_anti", "q26_ngram_jaccard",
    "q27_minhash_lsh_pairs", "q28_simhash_pairs", "q54_jaccard_prefix")

  Catalog.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val n = q.run(spark, SparkTestSession.Sf0001).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry() returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries and SQL is non-empty") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(SparkEntry.queries.contains(k))
      assert(sql.trim.nonEmpty)
    }
  }
}
