package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession
import graft.etl.{LagFeatures, Pivot}
import graft.functions.TopKByScore.top_k_by

/** ScalaCheck properties — SURVEY.md §5.2.3. Each evaluation runs real
  * Spark jobs, so the success count is kept small; the generators bias
  * toward collisions (few users/days/scores) to hit ties and gaps.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val genEvent: Gen[(Long, Int, String, Double)] = for {
    user <- Gen.choose(1L, 3L)
    day <- Gen.choose(1, 5)
    tpe <- Gen.oneOf("click", "view", "purchase", "signup", "error")
    v <- Gen.choose(0, 100)
  } yield (user, day, tpe, v.toDouble)

  private def toEventsDf(evs: List[(Long, Int, String, Double)]) =
    evs.toDF("user_id", "day", "event_type", "value")
      .select(col("user_id"),
        to_timestamp(format_string("2024-01-%02d 12:00:00", col("day"))).as("ts"),
        col("event_type"), col("value"))

  // A3: the one-hot pivot counters partition the row count — each
  // counter equals the filtered count and they sum to n_events
  property("pivot counters partition the rows") =
    forAll(Gen.listOfN(40, genEvent)) { evs =>
      evs.isEmpty || {
        val daily = Pivot.dailyUserCounters(toEventsDf(evs)).collect()
        daily.forall { r =>
          val counters = Seq("clicks", "views", "purchases", "signups", "errors")
            .map(c => r.getLong(r.fieldIndex(c)))
          counters.sum == r.getLong(r.fieldIndex("n_events")) &&
            counters.forall(_ >= 0)
        }
      }
    }

  // J5 == W1 on gap-free ranges (SURVEY §5.2.3): generated values over
  // a contiguous date range, every user present every day
  property("shiftJoin equals windowLag when dates are dense") =
    forAll(Gen.listOfN(12, Gen.choose(0L, 50L))) { vals =>
      val rows = for {
        (v, i) <- vals.zipWithIndex
        user = (i % 3).toString
        day = i / 3 + 1
      } yield (user, f"2024-02-$day%02d", v)
      val df = rows.toDF("key", "ds", "y").withColumn("ds", to_date(col("ds")))
      val a = LagFeatures.shiftJoin(df, "key", "ds", 1, Seq("y"), "_l")
        .select("key", "ds", "y", "y_l").collect().toSet
      val b = LagFeatures.windowLag(df, "key", "ds", 1, Seq("y"), "_l")
        .select("key", "ds", "y", "y_l").collect().toSet
      a == b
    }

  // The winnowing guarantee (Schleimer et al. §2): two documents
  // sharing a token run of ≥ w+k-1 tokens contain an identical window
  // of w consecutive k-gram hashes, and each selects that window's min
  // — so their fingerprint HASH sets must intersect (positions differ).
  property("winnowing guarantee: shared w+k-1 token run ⇒ shared fingerprint") = {
    val word = Gen.choose(1, 20).map(i => s"w$i")
    forAll(Gen.listOfN(6, word), Gen.listOfN(5, word),
           Gen.listOfN(5, word), Gen.listOfN(5, word), Gen.listOfN(5, word)) {
      (shared, p1, s1, p2, s2) =>
        val df = Seq(
          (1L, (p1 ++ shared ++ s1).mkString(" ")),
          (2L, (p2 ++ shared ++ s2).mkString(" "))).toDF("doc_id", "text")
        val fps = graft.text.Dedup.winnowFingerprints(df, 3, 4).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
        fps(1L).intersect(fps(2L)).nonEmpty
    }
  }

  // The PPJoin prefix bound is exact at ANY threshold: the ⌈t·|d|⌉
  // ceiling boundary (t·|d| integral vs not) is where an off-by-one
  // would silently drop pairs, so thresholds and doc sizes both vary.
  property("jaccardPairsPrefix == jaccardPairs across thresholds") = {
    val word = Gen.choose(1, 8).map(i => s"t$i") // tiny vocab → collisions
    val doc = Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, word))
    forAll(Gen.listOfN(4, doc), Gen.oneOf(0.3, 0.5, 0.75, 0.8)) { (docs, t) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      def pairs(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      pairs(graft.text.Dedup.jaccardPairsPrefix(df, t)) ==
        pairs(graft.text.Dedup.jaccardPairs(df, t))
    }
  }

  // top_k_by == sort-and-take reference semantics, including ties
  property("top_k_by matches sorted-take reference") =
    forAll(Gen.listOfN(25, Gen.zip(Gen.choose(0, 5), Gen.choose(0L, 1000L)))) { raw =>
      val data = raw.map { case (s, id) => (s.toDouble, id) }.distinct
      data.isEmpty || {
        val got = data.toDF("score", "id")
          .agg(top_k_by(col("score"), col("id"), 4).as("top"))
          .head.getSeq[org.apache.spark.sql.Row](0)
          .map(t => (t.getDouble(0), t.getLong(1)))
        val expect = data.sortBy { case (s, id) => (-s, id) }.take(4)
        got.toList == expect
      }
    }

  // Z-order locality: the Morton key preserves the box-membership
  // contract — decoding the interleave recovers both coordinates, so
  // filtering on zk-derived coords == filtering on the originals
  property("z_order_key round-trips both coordinates") =
    forAll(Gen.choose(0L, 0x7FFFFFFFL), Gen.choose(0L, 0x7FFFFFFFL)) { (a, b) =>
      val z = graft.functions.ZOrderKey.interleave2(a, b)
      def deinterleave(v: Long): Long = {
        var x = v & 0x5555555555555555L
        x = (x | (x >> 1)) & 0x3333333333333333L
        x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
        x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
        x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
        x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
        x
      }
      deinterleave(z) == a && deinterleave(z >> 1) == b
    }

  // PageRank conserves probability mass: with every node carrying an
  // out-edge (symmetrized graphs always do), Σpr = 0.15 + 0.85·Σpr
  // stays exactly 1 through any number of iterations
  property("pagerank mass sums to one on symmetrized graphs") =
    forAll(Gen.listOfN(12, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 5)))) { raw =>
      val es = raw.collect { case (a, b) if a != b => (s"n$a", s"n$b") }.distinct
      es.isEmpty || {
        val fwd = es.toDF("src", "dst")
        val edges = fwd.union(fwd.select(col("dst"), col("src")))
        val total = graft.queries.AnalyticsQueries.pageRank(edges, iters = 2)
          .agg(sum(col("pr"))).collect().head.getDouble(0)
        math.abs(total - 1.0) < 1e-9
      }
    }

  // EWMA is a convex combination of the prefix values: it can never
  // leave [min, max] of the daily sums seen so far
  property("ewma stays inside the prefix min/max envelope") =
    forAll(Gen.listOfN(30, genEvent)) { evs =>
      evs.isEmpty || {
        val df = toEventsDf(evs)
        val daily = df.groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sum(col("value")).as("v"))
          .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
        val prefix = daily.groupBy(_._1).flatMap { case (u, rows) =>
          val sorted = rows.sortBy(_._2)
          sorted.indices.map { i =>
            val seen = sorted.take(i + 1).map(_._3)
            ((u, sorted(i)._2), (seen.min, seen.max))
          }
        }
        graft.queries.AnalyticsQueries.ewmaDaily(df).collect().forall { r =>
          val (lo, hi) = prefix((r.getLong(0), r.getDate(1).toString))
          val e = r.getDouble(2)
          e >= lo - 1e-4 && e <= hi + 1e-4
        }
      }
    }

  // CDC round-trip: applying the derived change set reconstructs the
  // target snapshot exactly, and the diff is minimal (no no-op rows).
  // Keys AND values are NULLABLE on purpose: a NULL key must behave as
  // one matchable key (the null-safe <=> join in Cdc — a plain
  // equi-join would explode it into spurious I+D), and NULL→value /
  // value→NULL must surface as updates, not vanish.
  property("cdc diff∘apply reconstructs v2 and emits no no-ops") =
    forAll(
      Gen.mapOf(Gen.zip(Gen.option(Gen.choose(0L, 12L)), Gen.option(Gen.choose(0, 5)))),
      Gen.mapOf(Gen.zip(Gen.option(Gen.choose(0L, 12L)), Gen.option(Gen.choose(0, 5))))) { (m1, m2) =>
      val n1 = m1.map { case (k, v) => k -> v.map(_.toDouble) }
      val n2 = m2.map { case (k, v) => k -> v.map(_.toDouble) }
      val v1 = n1.toSeq.toDF("k", "v")
      val v2 = n2.toSeq.toDF("k", "v")
      def key(r: org.apache.spark.sql.Row): Option[Long] =
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      val changes = graft.etl.Cdc.diff(v1, v2)
      val rebuilt = graft.etl.Cdc.applyChanges(v1, changes).collect()
        .map(r => key(r) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val minimal = changes.collect().forall { r =>
        val (k, op) = (key(r), r.getString(1))
        op match {
          case "I" => !n1.contains(k) && n2.contains(k)
          case "D" => n1.contains(k) && !n2.contains(k)
          case "U" => n1.contains(k) && n2.contains(k) && n1(k) != n2(k)
        }
      }
      rebuilt == n2 && minimal
    }

  // funnel monotonicity: each stage's count can only shrink
  property("funnel stages are monotonically non-increasing") =
    forAll(Gen.listOfN(60, genEvent)) { evs =>
      evs.isEmpty || {
        val df = toEventsDf(evs)
        val row = graft.queries.AnalyticsQueries.funnel(df).collect().head
        val (su, sv, fu) = (row.getAs[Long]("n_signup"),
          row.getAs[Long]("n_signup_view"), row.getAs[Long]("n_full_funnel"))
        su >= sv && sv >= fu && fu >= 0
      }
    }
}
