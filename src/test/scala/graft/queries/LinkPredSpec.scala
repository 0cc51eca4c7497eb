package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand traces for q260 link prediction — a path graph where every
  * index is a pencil-and-paper number, and the existing-edge
  * exclusion the fixture can't isolate.
  */
class LinkPredSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q260: path graph 1-2-3-4 scores its two distance-2 pairs") {
    // edges {12, 23, 34}; degrees: 1→1, 2→2, 3→2, 4→1.
    // candidates: (1,3) through 2 and (2,4) through 3:
    //   cn = 1, aa = 1/ln 2 = 1.4427, ra = 0.5,
    //   (1,3): pa = 1·2 = 2, jaccard = 1/(1+2−1) = 0.5
    // (1,4) is distance 3 → absent; existing edges → absent.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r = LinkPredQueries.linkPrediction(e, 20).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet
      === Set((1L, 3L), (2L, 4L)))
    val p13 = r.find(x => x.getLong(0) == 1L).get
    assert(p13.getLong(2) === 1)          // cn
    assert(p13.getDouble(3) === 1.4427)   // aa = 1/ln 2
    assert(p13.getDouble(4) === 0.5)      // ra
    assert(p13.getLong(5) === 2)          // pa
    assert(p13.getDouble(6) === 0.5)      // jaccard
  }

  test("q260: a triangle has no candidates (all pairs are edges)") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    assert(LinkPredQueries.linkPrediction(e, 20).count() === 0)
  }

  test("q260: the hub pair ranks first by Adamic-Adar") {
    // two hubs 1 and 2 sharing low-degree spokes 10..14 (degree 2
    // each) plus a weak pair (3,4) sharing one high-degree... keep it
    // simple: (1,2) share 5 spokes → aa = 5/ln 2; (3,4) share spoke
    // 20 only → aa = 1/ln 2. k=1 returns (1,2).
    val e = ((10L to 14L).flatMap(s => Seq((1L, s), (2L, s)))
      ++ Seq((3L, 20L), (4L, 20L))).map { case (a, b) =>
        (math.min(a, b), math.max(a, b)) }.toDF("u", "v")
    val top = LinkPredQueries.linkPrediction(e, 1).collect().head
    assert((top.getLong(0), top.getLong(1)) === ((1L, 2L)))
    assert(top.getLong(2) === 5)
  }
}
