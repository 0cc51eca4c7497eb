package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand traces for q262 TextRank — a chain graph where both unrolled
  * PageRank rounds are pencil arithmetic, plus the edge conventions
  * (distinct edges, no self-loops, the length-4 content filter).
  */
class TextrankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("q262: chain graph alpha-bravo-chill, two rounds by hand") {
    // degrees 1,2,1; S1 = (0.575, 1.85, 0.575);
    // S2: ends 0.15+0.85·(1.85/2) = 0.93625 — whose nearest double is
    //     0.93624999…, so BOTH engines round to 0.9362, not .9363;
    //     middle 0.15+0.85·(0.575+0.575) = 1.1275
    val r = TextQueries.textrank(docs("alpha bravo chill"), 20).collect()
    assert(r.map(_.getString(0)).toSeq === Seq("bravo", "alpha", "chill"))
    assert(r.head.getLong(1) === 2)
    assert(r.head.getDouble(2) === 1.1275)
    assert(r(1).getDouble(2) === 0.9362)
    assert(r(2).getDouble(2) === 0.9362)  // tie broken alphabetically
  }

  test("q262: repeated co-occurrence dedups; short words and self-pairs drop") {
    // "of" fails the length filter; alpha-bravo appears twice but the
    // edge is distinct; "delta delta" would be a self-loop → no edge,
    // so delta never scores (isolated nodes have no incoming mass)
    val r = TextQueries.textrank(
      docs("alpha of bravo alpha bravo", "delta delta"), 20).collect()
    assert(r.map(_.getString(0)).toSet === Set("alpha", "bravo"))
    // single distinct edge → both degree 1, S1 = 1.0, S2 = 1.0
    assert(r.forall(_.getLong(1) === 1))
    assert(r.forall(_.getDouble(2) === 1.0))
  }
}
