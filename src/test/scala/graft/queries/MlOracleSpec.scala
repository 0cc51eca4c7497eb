package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Planted-signal regimes for the closed-form ML wave (q254 OLS, q255
  * Gaussian NB, q256 stump, q257 Lloyd step) — the fixture is
  * signal-free by construction (R² ≈ 0, NB ≈ chance), so the specs
  * plant the structure each estimator must recover exactly.
  */
class MlOracleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ols: recovers an exactly linear surface with r2 = 1") {
    // y = 10 + 2q + 3d on a non-singular (q, d) grid
    val rows = for { q <- 1 to 4; d <- 0 to 2 }
      yield ("A", q.toDouble, d.toDouble, 10.0 + 2.0 * q + 3.0 * d)
    val r = MlOracleQueries.ols(rows.toDF(
      "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"))
      .collect().head
    assert(r.getLong(1) === 12)
    assert(r.getDouble(2) === 10.0)   // beta0
    assert(r.getDouble(3) === 2.0)    // beta1
    assert(r.getDouble(4) === 3.0)    // beta2
    assert(r.getDouble(5) === 1.0)    // r2
  }

  test("naive bayes: separates two shifted blobs perfectly") {
    // label 0 near the origin, label 1 shifted +10 in all four dims;
    // within-label jitter keeps every per-dim variance positive
    def blob(base: Float, label: Int, off: Long) =
      (0 until 6).map { i =>
        (off + i, Seq.fill(4)(base + 0.1f * (i % 3)), label) }
    val r = MlOracleQueries.naiveBayes(
      (blob(0f, 0, 0L) ++ blob(10f, 1, 100L))
        .toDF("vec_id", "embedding", "label"))
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2))).toSet
    assert(r === Set((0, 0, 6L), (1, 1, 6L)))
  }

  test("stump: a perfectly separating feature hits weighted gini 0") {
    // returnflag R exactly when quantity < 5; discount is noise; tax
    // constant (one distinct value → no valid split → absent)
    val rows = (0 until 20).map { i =>
      val q = (i % 10).toDouble
      (if (q < 5) "R" else "N", q, if (i % 2 == 0) 0.0 else 0.05, 0.0)
    }
    val out = MlOracleQueries.stump(rows.toDF(
      "l_returnflag", "l_quantity", "l_discount", "l_tax")).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("discount", "quantity"))
    val qrow = out.find(_.getString(0) == "quantity").get
    assert(qrow.getDouble(1) === 4.0)  // threshold: left = {0..4} all R
    assert(qrow.getDouble(4) === 0.0)  // weighted gini
    assert(out.find(_.getString(0) == "discount").get.getDouble(4) > 0.4)
  }

  test("mahalanobis: the trace identity holds and a far point is fenced") {
    // For sample covariance fitted on the scored cloud,
    // Σ d² = (n−1)·p exactly → mean d² = 2(n−1)/n whatever the data.
    // 20 jittered ring points + 1 point 1000σ out: the outlier's d²
    // approaches the (n−1)²/n ≈ 19 ceiling, far past χ²₂(0.99)=9.21.
    val ring = (0 until 20).map { i =>
      val a = 2 * math.Pi * i / 20
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat,
        0f, 0f), 0)
    }
    val far = (100L, Seq(1000f, 1000f, 0f, 0f), 0)
    val r = MlOracleQueries.mahalanobis(
      (ring :+ far).toDF("vec_id", "embedding", "label")).collect().head
    assert(r.getLong(1) === 21)
    assert(r.getDouble(2) === math.round(2.0 * 20 / 21 * 1e4) / 1e4)
    assert(r.getDouble(3) > 9.21)   // max d2: the planted point
    assert(r.getLong(4) === 1)      // exactly one beyond the fence
  }

  test("pca2: a perfectly correlated cloud has one axis at 45 degrees") {
    // points (t, t), t = 1..5: a = c = b = 2.5 → λ = (5, 0),
    // evr1 = 1, θ = ½·atan2(5, 0) = 45°
    val rows = (1 to 5).map(t =>
      (t.toLong, Seq(t.toFloat, t.toFloat, 0f, 0f), 0))
    val r = MlOracleQueries.pca2(
      rows.toDF("vec_id", "embedding", "label")).collect().head
    assert(r.getDouble(2) === 5.0)    // lambda1 = 2·var
    assert(r.getDouble(3) === 0.0)    // lambda2
    assert(r.getDouble(4) === 1.0)    // evr1
    assert(r.getDouble(5) === 45.0)   // theta
  }

  test("loo influence: hat trace identity, and a leverage point inflates PRESS") {
    // noisy linear surface: y = 10 + 2q + 3d ± 1 on a 12-point grid
    def base = (for { q <- 1 to 4; d <- 0 to 2 } yield {
      val noise = if ((q + d) % 2 == 0) 1.0 else -1.0
      ("A", q.toDouble, d.toDouble, 10.0 + 2.0 * q + 3.0 * d + noise)
    })
    val clean = MlOracleQueries.looInfluence(base.toDF(
      "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"))
      .collect().head
    // Σh_i = p exactly → mean_h = 3/12 = 0.25 whatever the data
    assert(clean.getDouble(3) === 0.25)
    val cleanPress = clean.getDouble(2)
    // one point far out in covariate space (q = 50) and off the line:
    // its hat → 1, the LOO residual blows up, PRESS inflates hard
    val dirty = MlOracleQueries.looInfluence(
      (base :+ ("A", 50.0, 0.0, 500.0)).toDF(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"))
      .collect().head
    assert(dirty.getDouble(3) === math.round(3.0 / 13 * 1e8) / 1e8)
    assert(dirty.getDouble(2) > cleanPress * 2,
      s"press ${dirty.getDouble(2)} vs clean $cleanPress")
    assert(dirty.getDouble(4) > clean.getDouble(4)) // max Cook's D up
    assert(dirty.getLong(5) >= 1)                   // flagged influential
  }

  test("ridge: λ=0 reproduces OLS; λ→∞ kills slopes and recovers ȳ") {
    val rows = for { q <- 1 to 4; d <- 0 to 2 }
      yield ("A", q.toDouble, d.toDouble, 10.0 + 2.0 * q + 3.0 * d)
    val df = rows.toDF(
      "l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
    val path = MlOracleQueries.ridgePath(df, Seq(0.0, 1e9)).collect()
    val ols = path.find(_.getDouble(1) == 0.0).get
    assert((ols.getDouble(2), ols.getDouble(3), ols.getDouble(4))
      === ((10.0, 2.0, 3.0)))
    val inf = path.find(_.getDouble(1) == 1e9).get
    assert(inf.getDouble(5) < 1e-4)                   // slopes gone
    // ȳ = 10 + 2·2.5 + 3·1 = 18
    assert(math.abs(inf.getDouble(2) - 18.0) < 1e-3)  // intercept → ȳ
  }

  test("boost round: a stepwise target is recovered exactly (gain 1)") {
    // y = 100 for q ≤ 5, 200 for q > 5; discount/tax carry nothing.
    // Stage-0 mean = 150, residuals ±50; the quantity stump at 5
    // zeroes the SSE: leaves (−50, +50), gain = 1.
    val rows = (0 until 20).map { i =>
      val q = (i % 10).toDouble
      ("A", q, (i % 2) * 0.05, (i % 3) * 0.01,
        if (q <= 5) 100.0 else 200.0)
    }
    // 12 rows have q ≤ 5 (q ∈ 0..5 twice), 8 rows q ∈ 6..9 →
    // mean = (12·100 + 8·200)/20 = 140; leaves −40 / +60
    val r = MlOracleQueries.boostRound(rows.toDF("l_returnflag",
      "l_quantity", "l_discount", "l_tax", "l_extendedprice"))
      .collect().head
    assert(r.getString(1) === "quantity")
    assert(r.getDouble(2) === 5.0)
    assert(r.getDouble(3) === -40.0)
    assert(r.getDouble(4) === 60.0)
    assert(r.getDouble(5) === 1.0)
  }

  test("q282 irls: two Newton steps hand-traced on an orthogonal design") {
    // q = (1,-1,1,-1), d = (1,1,-1,-1), y = 1 iff q = 1: the design is
    // orthogonal (X'X = 4I), so step 1 collapses to beta1 = (0, 2, 0)
    // and step 2's diagonal weighted system gives delta1 = 1/sigma(2),
    // i.e. beta2_1 = 2 + 1 + e^-2 = 3.1353.
    val rows = Seq((1.0, 1.0, "R"), (-1.0, 1.0, "N"),
      (1.0, -1.0, "R"), (-1.0, -1.0, "N"))
      .map { case (q, d, fl) => ("O", fl, q, d) }
    val out = MlOracleQueries.irlsStep(rows.toDF(
      "l_linestatus", "l_returnflag", "l_quantity", "l_discount"))
      .collect()
    val s1 = out.find(_.getInt(1) == 1).get
    val s2 = out.find(_.getInt(1) == 2).get
    assert((s1.getDouble(2), s1.getDouble(3), s1.getDouble(4))
      === ((0.0, 2.0, 0.0)))
    // ll at beta1: 4 * (-ln(1 + e^-2)) = -0.5077, all 4 classified right
    assert(s1.getDouble(5) ===
      math.round(4 * -math.log(1 + math.exp(-2.0)) * 1e4) / 1e4)
    assert(s1.getLong(6) === 4L)
    val d1 = 1.0 + math.exp(-2.0) // 1/sigma(2)
    assert((s2.getDouble(2), s2.getDouble(3), s2.getDouble(4))
      === ((0.0, math.round((2.0 + d1) * 1e4) / 1e4, 0.0)))
    // Newton ascends the concave log-likelihood on this frame
    assert(s2.getDouble(5) > s1.getDouble(5))
    assert(s2.getLong(6) === 4L)
  }

  test("q283 em: pure-parity docs get the exact sigma(5 ln2) responsibilities") {
    // 4 odd-parity + 4 even-parity tokens (parity = md5 first hex digit
    // mod 2, computed here with MessageDigest so the plant tracks the
    // query's own hash), docs of 5 tokens drawn purely from one class.
    // With a balanced vocab Z1 = Z2, so L_d = ln2·(2C1 − n) = ±5·ln2
    // and r = sigma(±5 ln2) = 32/33 | 1/33; the M-step masses collapse
    // to the same two fractions and pi stays 1/2 by symmetry.
    def parity(w: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      ((d(0) >> 4) & 0xf) % 2
    }
    val words = (1 to 200).map(i => s"tok$i")
    val odd = words.filter(parity(_) == 1).take(4)
    val even = words.filter(parity(_) == 0).take(4)
    assert(odd.size === 4 && even.size === 4)
    def doc(ws: Seq[String]) = (ws :+ ws.head).mkString(" ")
    val docs = Seq(
      (1L, doc(odd), "oddsrc"), (2L, doc(odd.reverse), "oddsrc"),
      (3L, doc(even), "evensrc"), (4L, doc(even.reverse), "evensrc"))
    val out = MlOracleQueries.emTopics(
        docs.toDF("doc_id", "text", "source")).collect()
      .map(r => r.getString(0) -> r).toMap
    val o = out("oddsrc"); val e = out("evensrc")
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(o.getDouble(2) === r6(32.0 / 33))  // mean_resp
    assert(e.getDouble(2) === r6(1.0 / 33))
    assert(o.getDouble(3) === 0.5)            // pi_new (symmetry)
    assert(o.getDouble(4) === r6(32.0 / 33))  // mass1_odd sharpened
    assert(o.getDouble(5) === r6(1.0 / 33))   // mass2_odd suppressed
  }

  test("q285 isotonic: hand-traced PAV pools, monotone, and a sequential cross-check") {
    import java.sql.Date
    def fitOf(ys: Seq[Double]): Seq[Double] = {
      val rows = ys.zipWithIndex.map { case (y, i) =>
        ("A", Date.valueOf(f"2024-01-${i + 1}%02d"), y) }
      MlOracleQueries.isotonicFit(rows.toDF("l_returnflag", "wk", "y"))
        .collect().map(_.getDouble(3)).toSeq
    }
    // [3,1,2]: PAV pools 3,1 → 2,2; third stays → [2,2,2]
    assert(fitOf(Seq(3, 1, 2)) === Seq(2.0, 2.0, 2.0))
    // [1,3,2,4]: only 3,2 pool → [1, 2.5, 2.5, 4]
    assert(fitOf(Seq(1, 3, 2, 4)) === Seq(1.0, 2.5, 2.5, 4.0))
    // already monotone is a fixed point
    assert(fitOf(Seq(1, 2, 3)) === Seq(1.0, 2.0, 3.0))
    // fixture: per-group fit is non-decreasing and equals a
    // driver-side sequential PAV on the same integer weekly series
    def pav(ys: Seq[Long]): Seq[Double] = {
      // stack of (pooled sum, width)
      val st = collection.mutable.ArrayBuffer.empty[(Long, Int)]
      ys.foreach { y =>
        var blk = (y, 1)
        while (st.nonEmpty &&
            st.last._1.toDouble / st.last._2 >= blk._1.toDouble / blk._2) {
          val p = st.remove(st.size - 1)
          blk = (p._1 + blk._1, p._2 + blk._2)
        }
        st += blk
      }
      st.toSeq.flatMap { case (s, w) =>
        Seq.fill(w)(math.round(s.toDouble / w * 1e4) / 1e4) }
    }
    val out = graft.SparkEntry.queries("q285_isotonic")(spark, SparkTestSession.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    out.groupBy(_._1).values.foreach { g =>
      val fits = g.map(_._3).toSeq
      assert(fits === fits.sorted, "fit not monotone")
      assert(fits === pav(g.map(_._2).toSeq), "minimax != sequential PAV")
    }
  }

  test("lloyd step: 1-dim hand trace and the WCSS identity") {
    // points {0,1,4,5}, seeds at 0 and 5 → clusters {0,1} and {4,5};
    // each: wb = 1, mu at the midpoint, shift 0.5,
    // wcss_after = wb − n·shift² = 0.5 (= Σ(x−μ)² directly)
    val rows = Seq((0L, Seq(0f), 0), (1L, Seq(1f), 0),
      (2L, Seq(4f), 0), (3L, Seq(5f), 0))
    val r = MlOracleQueries.lloydStep(
      rows.toDF("vec_id", "embedding", "label"), Seq(0L, 3L))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4)))
    assert(r.toSeq === Seq((0L, 2L, 1.0, 0.5, 0.5),
      (3L, 2L, 1.0, 0.5, 0.5)))
  }
}
