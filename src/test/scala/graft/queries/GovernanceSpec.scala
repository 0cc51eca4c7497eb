package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand traces for q264 k-anonymity/l-diversity — a frame with a
  * singleton group (re-identifiable), a safe-but-leaky group (k ≥ 5,
  * l = 1), and a safe diverse group.
  */
class GovernanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q264: k counts, l-diversity, and the k<5 risk flag") {
    // (1,A): 6 rows, balances spanning neg/mid/high → k=6, l=3, safe
    // (1,B): singleton → k=1, at_risk, trivially l=1
    // (2,A): 5 rows all mid → k=5 (safe) but l=1 (value leak)
    val rows =
      Seq(-10.0, 100.0, 900.0, 6000.0, 7000.0, 8000.0)
        .map(b => (1, "A", b)) ++
      Seq((1, "B", 42.0)) ++
      Seq.fill(5)((2, "A", 1000.0))
    val r = GovernanceQueries.kAnonymity(
      rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")).collect()
      .map(x => ((x.getInt(0), x.getString(1)),
        (x.getLong(2), x.getLong(3), x.getInt(4)))).toMap
    assert(r((1, "A")) === ((6L, 3L, 0)))
    assert(r((1, "B")) === ((1L, 1L, 1)))
    assert(r((2, "A")) === ((5L, 1L, 0)))
  }
}
