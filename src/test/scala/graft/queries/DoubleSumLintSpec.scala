package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Registration lint for the order-dependent inexact-SUM class
  * (round-11 verdict #2) — the PlanLintSpec pattern applied to
  * [[DoubleSums]]: every catalog query whose ANALYZED plan contains a
  * Sum/Average/central-moment/corr/cov aggregate over a float/double
  * input must appear in `DoubleSums.registry` with a classified
  * rationale, and the register is EXACT — a new unregistered site
  * fails here (forcing the author to classify it: integerize it, fold
  * it deterministically, or own the residual), and a stale entry
  * (query no longer planning the shape) also fails, so the COVERAGE.md
  * inventory cannot drift from the code.
  */
class DoubleSumLintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val validPrefixes =
    Seq("exact:", "grid(2dp):", "residual:", "no-oracle:")

  test("every inexact-SUM site is registered, and the register is exact") {
    val flagged = scala.collection.mutable.Map.empty[String, Seq[String]]
    Catalog.all.foreach { q =>
      val sites = DoubleSums.sites(q.run(spark, SparkTestSession.Sf0001))
      if (sites.nonEmpty) flagged(q.name) = sites
    }
    val unregistered = flagged.keySet -- DoubleSums.registry.keySet
    assert(unregistered.isEmpty,
      "unregistered inexact-SUM site(s) — classify in DoubleSums.registry " +
        "(exact / grid / residual / no-oracle) and record in COVERAGE.md's " +
        "round-12 inventory:\n" +
        unregistered.toSeq.sorted.map(n =>
          s"  $n:\n    ${flagged(n).mkString("\n    ")}").mkString("\n"))
    val stale = DoubleSums.registry.keySet -- flagged.keySet
    assert(stale.isEmpty,
      s"stale DoubleSums.registry entries (no inexact-SUM site planned " +
        s"anymore — delete them): ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("registry entries name real catalog queries with classified rationales") {
    val names = Catalog.all.map(_.name).toSet
    DoubleSums.registry.foreach { case (k, v) =>
      assert(names.contains(k), s"DoubleSums.registry has unknown query $k")
      assert(validPrefixes.exists(v.startsWith),
        s"$k rationale must start with one of ${validPrefixes.mkString(", ")}")
    }
  }

  test("the detector fires on planted sum/avg/moment sites and stays quiet on safe shapes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq((1L, 0.5, 1.0f), (2L, 1.5, 2.0f)).toDF("k", "d", "f")
    // planted positives: double sum, float sum, double avg, moment, corr
    assert(DoubleSums.sites(base.agg(sum($"d"))).exists(_.contains("sum")))
    assert(DoubleSums.sites(base.agg(sum($"f"))).exists(_.contains("sum")))
    assert(DoubleSums.sites(base.agg(avg($"d"))).exists(_.contains("avg")))
    assert(DoubleSums.sites(base.agg(stddev($"d")))
      .exists(_.contains("stddev")))
    assert(DoubleSums.sites(base.agg(corr($"d", $"f")))
      .exists(_.contains("corr")))
    // planted positive: a WINDOW sum over double is flagged as window
    val w = org.apache.spark.sql.expressions.Window.orderBy($"k")
    assert(DoubleSums.sites(base.select(sum($"d").over(w)))
      .exists(_.startsWith("window")))
    // quiet: long sums, counts, decimal accumulation (the agreement-
    // family exact-integer pattern), and the q246 deterministic fold
    // (higher-order aggregate over a sorted collect_list) do not flag
    assert(DoubleSums.sites(base.agg(sum($"k"))).isEmpty)
    assert(DoubleSums.sites(base.agg(count(lit(1)))).isEmpty)
    assert(DoubleSums.sites(
      base.agg(sum($"k".cast("decimal(38,0)")))).isEmpty)
    assert(DoubleSums.sites(base.groupBy($"k")
      .agg(aggregate(array_sort(collect_list(struct($"k", $"d"))),
        lit(0.0), (acc, x) => acc + x.getField("d")).as("fold"))).isEmpty)
  }
}
