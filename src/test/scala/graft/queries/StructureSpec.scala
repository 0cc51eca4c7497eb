package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables

/** Invariants for the corpus-structure wave (q183–q187) beyond the
  * DuckDB value-equality the oracles already enforce: the phrase
  * intersection must agree with the naive gram scan, the triangle
  * enumeration with a brute-force closure check, the skyline with a
  * pairwise dominance sweep, and JSD with its mathematical bounds. */
class StructureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  test("q183 postings intersection equals the naive gram-equality scan") {
    // independent derivation: materialize every 3-gram, count matches
    // of the top gram per doc — the form the postings join avoids
    val words = Tables.documents(spark, sf).select(col("doc_id"),
      posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = words
      .withColumn("g", concat_ws(" ", col("tok"),
        lead(col("tok"), 1).over(w), lead(col("tok"), 2).over(w)))
      .where(size(split(col("g"), " ")) === 3)
    val top = grams.groupBy(col("g")).count()
      .orderBy(col("count").desc, col("g")).limit(1)
      .collect()(0).getString(0)
    val naive = grams.where(col("g") === top)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .toSet
    val out = StructureQueries.q183PhraseSearch.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(out === naive)
    assert(out.nonEmpty)
  }

  test("q186 equals brute-force triangle closure on the same edge set") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.toDF("ok", "u").join(li.toDF("ok", "v"), Seq("ok"))
      .where(col("u") < col("v"))
      .groupBy(col("u"), col("v")).count().where(col("count") >= 2)
      .select(col("u"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = e.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val brute = (for {
      (a, b) <- e
      c <- adj.getOrElse(b, Set.empty)
      if e.contains((a, c))
    } yield (a, b, c)).toSet
    val out = StructureQueries.q186TriangleCount.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === brute)
  }

  test("q187 equals the pairwise dominance sweep, ties kept") {
    val t = Tables.documents(spark, sf).select(col("source"), col("doc_id"),
        col("n_chars"),
        size(array_distinct(split(lower(trim(col("text"))), "\\s+")))
          .cast("long").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val front = t.filter { case (s0, _, x, y) =>
      !t.exists { case (s1, _, x1, y1) =>
        s1 == s0 && ((x1 > x && y1 >= y) || (x1 >= x && y1 > y))
      }
    }.map(r => (r._1, r._2)).toSet
    val out = StructureQueries.q187ParetoFront.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === front)
    assert(out.nonEmpty)
  }

  test("CopurchaseLayout round-trips the live derivation exactly") {
    val live = graft.sources.CopurchaseLayout
      .derivePairCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val layout = graft.sources.CopurchaseLayout.pairCounts(spark, sf)
      .select(col("u"), col("v"), col("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(layout === live)
    assert(live.nonEmpty)
  }

  test("q188 coefficients equal the brute-force per-node triangle count") {
    val e = graft.sources.CopurchaseLayout.pairCounts(spark, sf)
      .where(col("c") >= 2).select(col("u"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val adj = e.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      (a, b) <- e
      c <- adj.getOrElse(b, Set.empty)
      if e.contains((a, c))
    } { triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1 }
    val expected = deg.filter(_._2 >= 2).map { case (n, dg) =>
      (n, dg, triPerNode(n),
        BigDecimal(2.0 * triPerNode(n) / (dg * (dg - 1)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val out = StructureQueries.q188ClusteringCoeff.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out === expected)
    assert(out.exists(_._3 > 0))
  }

  test("q193 assortativity is a correlation in [-1,1] over the layout's graph") {
    val r = StructureQueries.q193DegreeAssortativity.run(spark, sf)
      .collect()(0)
    val e = graft.sources.CopurchaseLayout.pairCounts(spark, sf)
      .where(col("c") >= 2).count()
    assert(r.getLong(1) === e)
    assert(r.getDouble(4) >= -1 && r.getDouble(4) <= 1)
    assert(r.getLong(2) >= math.ceil(r.getDouble(3)).toLong) // max >= mean
  }

  test("q191 incremental triangles equal the q186 batch enumeration, non-vacuously") {
    val batch = StructureQueries.q186TriangleCount.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = StructureQueries.q191IncrementalTriangles.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === batch)
    // non-vacuous: the wave must actually add triangles beyond
    // yesterday's persisted table, and yesterday must have some
    val yTri = graft.sources.CopurchaseLayout
      .yesterdayTriangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(yTri.nonEmpty, "yesterday graph has no triangles — vacuous")
    assert((batch -- yTri).nonEmpty, "wave adds no triangles — vacuous")
    assert(yTri.subsetOf(batch), "monotonicity: old triangles must survive")
  }

  test("q185 JSD is within (0, 1] for distinct sources and symmetric in formulation") {
    val rows = StructureQueries.q185JsDivergence.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getDouble(2)
      assert(j > 0.0 && j <= 1.0, s"${r.getString(0)}/${r.getString(1)} jsd=$j")
    }
    // the pair list is the strict upper triangle: no (a,a), no swapped dup
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length === pairs.length)
  }

  test("q184 matches a driver-side OLS replay of the log-log fit") {
    val counts = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("source"), col("tok")).count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = counts.groupBy(_._1).map { case (src, rows) =>
      val top = rows.sortBy(t => (-t._3, t._2)).take(100)
      val xy = top.zipWithIndex.map { case ((_, _, c), i) =>
        (math.log(i + 1.0), math.log(c.toDouble))
      }
      val n = xy.length
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val sxy = xy.map(t => t._1 * t._2).sum
      val sxx = xy.map(t => t._1 * t._1).sum
      val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      src -> (n.toLong, slope)
    }
    val out = StructureQueries.q184ZipfFit.run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (src, n, slope, r2) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(4))
      val (en, eslope) = expected(src)
      assert(n === en, s"$src n")
      assert(math.abs(slope - eslope) < 5e-4, s"$src slope $slope vs $eslope")
      assert(slope < 0, s"$src slope must be negative")
      assert(r2 > 0 && r2 <= 1, s"$src r2 $r2")
    }
  }

  test("q232 BFS: hand hops, hub tiebreak, unreachable exclusion") {
    import spark.implicits._
    // hub 2 (deg 3); chain 2-1, 2-3-4; 5-6 unreachable from the hub.
    // node 2 ties nothing; add 7 to make deg(2)=3 unambiguous.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 7L), (5L, 6L))
      .toDF("u", "v")
    val got = StructureQueries.bfsHops(e, maxHops = 12)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(2L -> 0, 1L -> 1, 3L -> 1, 7L -> 1, 4L -> 2))
    // degree tie (all deg 1 in 8-9): min id 8 wins the hub seat
    val tie = Seq((9L, 8L)).toDF("u", "v")
    val t = StructureQueries.bfsHops(tie, maxHops = 12)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(t === Map(8L -> 0, 9L -> 1))
  }

  test("q233 k-core: the pendant corona peels, the clique survives") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + pendant chain 4-5-6: 3-core = the clique
    // (each member keeps deg 3); 5 and 6 peel in two rounds
    val clique = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val e = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val got = StructureQueries.kCore(e, k = 3, maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    // a triangle has no 3-core... it does: deg 2 < 3 → empty
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(StructureQueries.kCore(tri, k = 3, maxRounds = 12).isEmpty)
    // but it IS its own 2-core
    assert(StructureQueries.kCore(tri, k = 2, maxRounds = 12)
      .collect().length === 3)
  }
}
