package graft.text

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Connected-components correctness against a driver-side union-find
  * reference across graph shapes that stress the star algorithm
  * differently (long chains → many rounds; cliques → fat stars;
  * random graphs → both). */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference union-find over the same edge list. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // second pass: full path compression so every node maps to its min root
    parent.keys.toSeq.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def check(edges: Seq[(Long, Long)]): Unit =
    assert(ccOf(edges) === unionFind(edges))

  test("path graph collapses to one component rooted at the min") {
    check((1L until 20L).map(i => (i, i + 1)))
  }

  test("two disjoint triangles stay separate") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L)))
  }

  test("star centered on the max node roots at the min leaf") {
    check((1L to 9L).map(i => (100L, i)))
  }

  test("duplicate and reversed edges are harmless") {
    check(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (2L, 1L)))
  }

  test("empty edge list yields empty assignment") {
    assert(ccOf(Seq.empty).isEmpty)
  }

  test("seeded random graphs match union-find") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(50)(
        (rng.nextInt(60).toLong, rng.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      check(edges)
    }
  }

  test("dedupComponents: every doc labeled, pairs co-labeled, singletons self-labeled") {
    val docs = graft.model.Tables.documents(spark, SparkTestSession.Sf0001)
    val cc = Components.dedupComponents(docs, 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === docs.count())
    val pairs = Dedup.jaccardPairs(docs, 0.4)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(cc(a) === cc(b), s"pair ($a,$b) split across components")
    }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    cc.foreach { case (doc, comp) =>
      if (!paired(doc)) assert(comp === doc, s"singleton $doc relabeled")
      assert(comp <= doc, "component id must be the min member")
    }
  }
}
