package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand traces for the agreement wave (q251 Cohen, q252 Fleiss, q253
  * Krippendorff) — the textbook confusion tables where every κ/α is a
  * pencil-and-paper rational, plus the degenerate limits (perfect
  * agreement, independent raters) the fixture's correlated raters
  * can't reach.
  */
class AgreementSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rt(rows: Seq[(Long, String, Int)]) =
    rows.map { case (d, r, c) => (d, "s", r, c) }
      .toDF("doc_id", "source", "rater", "cat")

  test("cohen: the classic 50-case 2x2 table gives kappa 0.4") {
    // both-yes 20, both-no 15, a-yes/b-no 5, a-no/b-yes 10:
    // po = 35/50 = 0.7; pA(1) = 0.5, pB(1) = 0.6 → pe = 0.5 → κ = 0.4
    val rows =
      (1L to 20L).flatMap(d => Seq((d, "a", 1), (d, "b", 1))) ++
      (21L to 35L).flatMap(d => Seq((d, "a", 0), (d, "b", 0))) ++
      (36L to 40L).flatMap(d => Seq((d, "a", 1), (d, "b", 0))) ++
      (41L to 50L).flatMap(d => Seq((d, "a", 0), (d, "b", 1)))
    val r = AgreementQueries.cohensKappa(rt(rows)).collect().head
    assert(r.getString(0) === "a-b")
    assert(r.getDouble(1) === 0.7)
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 0.4)
  }

  test("cohen: independent balanced raters land exactly on kappa 0") {
    // a alternates per doc, b alternates per doc-pair: po = pe = 0.5
    val rows = (0L to 3L).flatMap(d =>
      Seq((d, "a", (d % 2).toInt), (d, "b", (d / 2 % 2).toInt)))
    val r = AgreementQueries.cohensKappa(rt(rows)).collect().head
    assert(r.getDouble(1) === 0.5)
    assert(r.getDouble(3) === 0.0)
  }

  test("fleiss: hand-traced 3-doc pool gives kappa -1/8") {
    // d1 = {0,0,0} P_i=1; d2 = {0,0,1} P_i=1/3; d3 = {0,1,2} P_i=0
    // P̄ = 4/9; p = (6/9, 2/9, 1/9) → P̄e = 41/81 → κ = -5/40 = -0.125
    val rows = Seq(
      (1L, "a", 0), (1L, "b", 0), (1L, "c", 0),
      (2L, "a", 0), (2L, "b", 0), (2L, "c", 1),
      (3L, "a", 0), (3L, "b", 1), (3L, "c", 2))
    val r = AgreementQueries.fleissKappa(rt(rows)).collect().head
    assert(r.getLong(1) === 3)
    assert(r.getDouble(2) === 0.4444)   // p_bar
    assert(r.getDouble(3) === 0.5062)   // p_e
    assert(r.getDouble(4) === -0.125)   // kappa
  }

  test("fleiss: per-doc unanimity across two categories is kappa 1") {
    val rows = Seq(
      (1L, "a", 0), (1L, "b", 0), (1L, "c", 0),
      (2L, "a", 1), (2L, "b", 1), (2L, "c", 1))
    val r = AgreementQueries.fleissKappa(rt(rows)).collect().head
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(4) === 1.0)
  }

  test("krippendorff: unanimous units with split categories give alpha 1") {
    val rows = Seq(
      (1L, "a", 0), (1L, "b", 0), (1L, "c", 0),
      (2L, "a", 1), (2L, "b", 1), (2L, "c", 1))
    val r = AgreementQueries.krippendorff(rt(rows)).collect().head
    assert(r.getLong(0) === 2)
    assert(r.getDouble(1) === 0.0)      // d_o
    assert(r.getDouble(3) === 1.0)      // alpha
  }

  test("krippendorff: hand-traced coincidence matrix gives alpha 11/27") {
    // d1 = {0,0,1}, d2 = {0,1,1}, d3 = {2,2,2}:
    // o off-diag sum 4, n = 9 → Do = 4/9; n_c = (3,3,3) →
    // De = 54/72 = 0.75 → α = 1 − (4/9)/(3/4) = 11/27 = 0.4074
    val rows = Seq(
      (1L, "a", 0), (1L, "b", 0), (1L, "c", 1),
      (2L, "a", 0), (2L, "b", 1), (2L, "c", 1),
      (3L, "a", 2), (3L, "b", 2), (3L, "c", 2))
    val r = AgreementQueries.krippendorff(rt(rows)).collect().head
    assert(r.getDouble(1) === 0.4444)   // d_o
    assert(r.getDouble(2) === 0.75)     // d_e
    assert(r.getDouble(3) === 0.4074)   // alpha
  }
}
