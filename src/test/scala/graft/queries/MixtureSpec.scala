package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables

/** Exact independent recomputations of the curation-wave-two queries:
  * the mixture draw (q101), start-offset packing (q102) and the
  * recursive chain closure (q103) are all deterministic, so the spec
  * re-derives each result with plain Scala and compares sets exactly —
  * stronger than the row-count smoke the driver does for rows-only
  * entries, and DuckDB-free.
  */
class MixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  private def run(name: String) =
    Catalog.all.find(_.name == name).get.run(spark, sf)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q101 keeps exactly the docs the md5 mixture rule admits") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.filter { case (id, src) =>
      val cutoff = src.drop(3).toInt % 4 match {
        case 0 => "g"; case 1 => "8000"; case 2 => "4000"; case _ => "2000"
      }
      md5hex(id.toString).take(4) < cutoff
    }.map(_._1).toSet
    val got = run("q101_mixture_sample").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < docs.length)
    // full-rate sources (idx % 4 == 0) must survive completely
    val full = docs.filter(_._2.drop(3).toInt % 4 == 0).map(_._1).toSet
    assert(full.subsetOf(got))
  }

  test("q102 bins equal a sequential per-shard start-offset repack") {
    val toks = Tables.documents(spark, sf).select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").length.toLong))
      .sortBy(_._1)
    val expected = toks.toSeq.groupBy(_._1 % MixtureQueries.PackShards)
      .toSeq.flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (_, tok) =>
          val bin = cum / MixtureQueries.PackBudget
          cum += tok
          ((shard, bin), tok)
        }
      }.groupBy(_._1).map { case ((shard, bin), rows) =>
        (shard, bin, rows.size.toLong, rows.map(_._2).sum)
      }.toSet
    val got = run("q102_seq_packing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    // every doc lands in exactly one bin
    assert(got.toSeq.map(_._3).sum === toks.length.toLong)
  }

  test("q120 equals a driver-side Efraimidis-Spirakis draw, and weights bite") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keyed = docs.map { case (id, src, w) =>
      val u = (java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) + 1L) /
        4294967296.0
      (src, id, BigDecimal(math.log(u) / w)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expected = keyed.toSeq.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(3)
    }.map(r => (r._1, r._2)).toSet
    val got = run("q120_weighted_sample").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
    // weighting must bite: winners are longer than their source median
    val med = docs.map(_._3).sorted.apply(docs.length / 2)
    val winners = docs.filter(d => got.contains((d._2, d._1))).map(_._3)
    assert(winners.count(_ >= med) > winners.length / 2,
      s"weighted draw should prefer long docs: $winners vs median $med")
  }

  test("q129 splits never separate a near-dup pair; per-doc hashing would") {
    val split = run("q129_leakage_safe_split").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = graft.text.Dedup
      .jaccardPairs(Tables.documents(spark, sf), 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // the whole point: no near-dup pair straddles the boundary
    assert(pairs.forall { case (a, b) => split(a) == split(b) })
    // contrast: the naive per-DOC draw (q101's rule on doc_id) places
    // at least one near-dup pair on opposite sides of the cut
    def docSide(id: Long) =
      if (md5hex(id.toString).take(1) < "4") "test" else "train"
    assert(pairs.exists { case (a, b) => docSide(a) != docSide(b) },
      "fixture should demonstrate the leak the component split prevents")
    // both sides populated
    assert(split.values.toSet === Set("train", "test"))
  }

  test("q103 chains equal a driver-side walk of the min-successor graph") {
    val edges = graft.text.Dedup
      .jaccardPairs(Tables.documents(spark, sf), 0.4)
      .groupBy(col("doc_a")).agg(min(col("doc_b")).as("nxt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = edges.keys.map { start =>
      var cur = edges(start); var depth = 1
      while (edges.contains(cur)) { cur = edges(cur); depth += 1 }
      (start, cur, depth)
    }.toSet
    val got = run("q103_recursive_chain").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
    // chain ends are sinks: no root may itself have an out-edge
    assert(got.forall { case (_, root, _) => !edges.contains(root) })
  }

  test("q267 ucb: day-1 name-order explore costs regret once, then the best arm holds") {
    import spark.implicits._
    // arm 'aa' pays 1/day, 'zz' pays 100/day, 10 days of both.
    // Day 1 has no priors at all → name-order explore picks 'aa'
    // (regret 99). From day 2 BOTH arms are seen (priors come from
    // logged exposure, not the policy's own picks), and the ucb bonus
    // (≤ √(2·ln 40 / 2) ≈ 1.9) can never bridge the 99-point mean
    // gap → 'zz' forever, regret flat at 99.
    val rows = (1 to 10).flatMap { d =>
      val ts = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
      Seq(("aa", ts, 1.0), ("aa", ts, 1.0),
        ("zz", ts, 100.0), ("zz", ts, 100.0))
    }
    val out = MixtureQueries.ucbMixture(
      rows.toDF("event_type", "ts", "value")).collect()
    assert(out.map(_.getString(2)).toSeq ===
      ("aa" +: Seq.fill(9)("zz")))
    assert(out.head.getLong(1) === 0)          // t_prior starts at 0
    assert(out.head.isNullAt(3))               // explore row has no ucb
    assert(out(1).getLong(1) === 4)            // day 1's 4 logged events
    assert(out(1).getDouble(5) === 99.0)       // the one explore day
    assert(out.last.getDouble(5) === 99.0)     // …and flat ever after
  }

  test("q180 temperature mix: shares sum to 1, α=0.7 compresses by the power law") {
    // ported from the retired q137 twin (round-9 verdict #3: one
    // temperature-mix operator, not two): the α-law invariants that
    // must hold for ANY corpus — shares normalize, small sources get
    // upsampled relative to large, and the tempered spread follows
    // max/min ratio^α exactly (w_i ∝ p_i^α ⟹ ratio_w = ratio_p^α).
    val rows = run("q180_temperature_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length >= 2)
    val tol = 1e-4
    assert(math.abs(rows.map(_._3).sum - 1.0) <= tol, "raw shares sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) <= tol, "weights sum to 1")
    val bySize = rows.sortBy(_._2)
    // boost = w / p_raw shrinks with size
    assert(bySize.head._4 / bySize.head._3 >= bySize.last._4 / bySize.last._3,
      "the smallest source must get at least the boost of the largest")
    val rawRatio = bySize.last._3 / bySize.head._3
    val wRatio = bySize.last._4 / bySize.head._4
    assert(wRatio <= rawRatio + tol,
      s"α=0.7 must compress spread (raw $rawRatio → tempered $wRatio)")
    assert(math.abs(wRatio - math.pow(rawRatio, 0.7)) <= 0.01,
      s"tempered ratio $wRatio should be raw ratio^0.7 (${math.pow(rawRatio, 0.7)})")
  }
}
