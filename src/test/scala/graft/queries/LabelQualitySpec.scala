package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.text.ClusteredEmbeddings

/** The parquet fixture's labels are random w.r.t. the vectors, so the
  * oracle rows only pin the MECHANICS of q141/q142. These tests pin
  * the DISCRIMINATION: on planted clusters with cluster-aligned
  * labels, a corrupted label must be flagged by both the local (kNN
  * agreement) and global (centroid distance) detectors, and clean
  * points must not be flagged by the local one.
  */
class LabelQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // labels = planted cluster id, except three corrupted points whose
  // label claims the NEXT cluster
  private val corrupted = Set(0L, 21L, 42L)
  private lazy val labeled = {
    val c = ClusteredEmbeddings.NumClusters
    ClusteredEmbeddings.fixture(spark)
      .withColumn("truth", (col("vec_id") % c).cast("int"))
      .withColumn("label",
        when(col("vec_id").isin(corrupted.toSeq: _*),
          ((col("truth") + 1) % c).cast("int"))
          .otherwise(col("truth")))
      .drop("truth")
  }

  test("q141 kNN agreement separates corrupted labels from clean ones") {
    val rows = LabelQualityQueries.knnLabelAgreement(labeled, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(rows.length === ClusteredEmbeddings.NumClusters *
      ClusteredEmbeddings.PerCluster)
    rows.foreach { case (id, nMatch, frac, suspect) =>
      if (corrupted(id)) {
        // 10-NN are same-cluster geometrically, labeled with the TRUE
        // cluster id — agreement with the corrupted claim must be ~0
        assert(frac <= 0.1 && suspect === 1,
          s"corrupted $id not flagged: frac=$frac")
      } else {
        // worst case a clean point's 10-NN include its cluster's one
        // corrupted member (wrong label) — still >= 0.9 agreement
        assert(frac >= 0.9 && suspect === 0,
          s"clean $id wrongly flagged: frac=$frac (n_match=$nMatch)")
      }
    }
  }

  test("q143 ANN agreement: >= 0.9 per-row parity with the exact twin, same discrimination") {
    val exact = LabelQualityQueries.knnLabelAgreement(labeled, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = LabelQualityQueries.annLabelAgreement(labeled, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getInt(4)))
    // every vector's own cell is always among its probes (it contains
    // the vector itself), so no query may vanish from the output
    assert(rows.length === exact.size, "ANN form dropped query vectors")
    // per-row agreement parity vs the exact twin: the IVF candidate set
    // is a subset of all pairs, so n_match can only drift where a true
    // neighbor sits outside the probed cells — on planted clusters that
    // must be rare (the verdict's >= 0.9 bar; measured 1.0 when the
    // probes cover each point's own cluster)
    val matching = rows.count { case (id, nMatch, _, _) => exact(id) == nMatch }
    val parity = matching.toDouble / rows.length
    assert(parity >= 0.9, s"ANN/exact n_match parity $parity < 0.9")
    // and the headline discrimination must survive the swap-in
    rows.foreach { case (id, _, frac, suspect) =>
      if (corrupted(id))
        assert(frac <= 0.1 && suspect === 1, s"corrupted $id not flagged: $frac")
      else
        assert(frac >= 0.9 && suspect === 0, s"clean $id wrongly flagged: $frac")
    }
  }

  test("q142 centroid distance ranks every corrupted label worst in its class") {
    val rows = LabelQualityQueries.centroidOutliers(labeled)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    val byLabel = rows.groupBy(_._2)
    corrupted.foreach { id =>
      val row = rows.find(_._1 == id).get
      assert(row._4 === 1, s"corrupted $id not flagged far (cos=${row._3})")
      val minCos = byLabel(row._2).map(_._3).min
      assert(row._3 === minCos,
        s"corrupted $id (cos=${row._3}) is not the farthest in label ${row._2}")
    }
    // clean clusters (no corrupted member claims them... every label
    // has exactly one claimant-corruption except none — corruption
    // claims label+1, so labels 1, 2, 3 host a foreign point); labels
    // untouched by corruption still flag their bottom tail, so only
    // sanity-check the flag rate stays a small minority overall
    val farRate = rows.count(_._4 == 1).toDouble / rows.length
    assert(farRate <= 0.1, s"far-flag rate $farRate implausibly high")
  }

  test("q166 hand triplet: exact pos/neg ids, null positive for a singleton label") {
    import spark.implicits._
    // v0,v1 share label 0; v2 is the only label-1 vector and sits much
    // closer to v0 than v1 does -> v0's triplet is HARD (neg beats pos)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.8f, 0.6f), 0),
      (2L, Array(1.0f, 0.05f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = LabelQualityQueries.hardNegatives(emb)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getInt(7)))
      .toMap
    assert(rows(0L) === ((1L, 2L, 1)),  // neg v2 (cos≈.999) > pos v1 (.8)
      s"v0 triplet wrong: ${rows(0L)}")
    assert(rows(1L) === ((0L, 2L, 1)),  // neg v2 (.829) > pos v0 (.8)
      s"v1 triplet wrong: ${rows(1L)}")
    // singleton label: no same-label candidate -> pos side NULL, and
    // is_hard stays 0 (a null margin is not a hard triplet)
    assert(rows(2L) === ((-1L, 0L, 0)), s"v2 triplet wrong: ${rows(2L)}")
  }

  test("q166 on planted clusters: corrupted labels yield hard triplets, clean far clusters do not") {
    val rows = LabelQualityQueries.hardNegatives(labeled)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(6)) Double.NaN else r.getDouble(6), r.getInt(7)))
    assert(rows.length === ClusteredEmbeddings.NumClusters *
      ClusteredEmbeddings.PerCluster)
    rows.foreach { case (id, margin, isHard) =>
      if (corrupted(id))
        // the nearest same-claimed-label vector sits in ANOTHER planted
        // cluster while the nearest other-label vector is a same-cluster
        // twin: the margin must be decisively negative
        assert(isHard === 1 && margin < -0.1,
          s"corrupted $id not a hard triplet (margin=$margin)")
      else if (id % ClusteredEmbeddings.NumClusters >= 4)
        // clusters 4..19 contain no mislabeled member and no corrupted
        // point claims them -> positives are same-cluster (sim~1),
        // negatives cross-cluster: never hard (margin strictly
        // positive; the sin-pattern centroids are not orthogonal, so
        // cross-cluster sims can run close — the SIGN is the invariant)
        assert(isHard === 0 && margin > 0,
          s"clean $id in an untouched cluster looks hard (margin=$margin)")
    }
  }

  test("q202 IVF triplets: >= 0.9 per-row parity with q166, same discrimination") {
    val exact = LabelQualityQueries.hardNegatives(labeled)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    val rows = LabelQualityQueries.ivfHardNegatives(labeled)
      .collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(4)) -1L else r.getLong(4)),
        if (r.isNullAt(6)) Double.NaN else r.getDouble(6), r.getInt(7)))
    // every anchor's own cell is among its probes, so no anchor may
    // vanish from the output
    assert(rows.length === exact.size, "IVF form dropped anchors")
    // per-row triplet parity (both pos_id and neg_id equal the exact
    // twin's): the probed cells are a candidate subset, so a triplet
    // can only drift where the true pos/neg sits outside the probes —
    // rare on planted clusters (the q143 >= 0.9 bar)
    val matching = rows.count { case (id, ids, _, _) => exact(id) == ids }
    val parity = matching.toDouble / rows.length
    assert(parity >= 0.9, s"IVF/exact triplet parity $parity < 0.9")
    // and the headline discrimination must survive the swap-in. A
    // corrupted anchor under IVF flags one of two ways: a decisively
    // negative margin (claimed-label points inside the probes, but a
    // same-cluster twin closer), or an EMPTY positive heap (pos_id
    // null — the claimed label's cluster is entirely absent from the
    // anchor's probed neighborhood, the strictly stronger mislabel
    // signal; the exact twin can't show this because it scans all
    // pairs). Both are the shared downstream reporting faithfully.
    rows.foreach { case (id, (posId, _), margin, isHard) =>
      if (corrupted(id))
        assert((isHard === 1 && margin < -0.1) || posId === -1L,
          s"corrupted $id not flagged under IVF (margin=$margin, pos=$posId)")
      else if (id % ClusteredEmbeddings.NumClusters >= 4)
        assert(isHard === 0 && margin > 0,
          s"clean $id in an untouched cluster looks hard under IVF (margin=$margin)")
    }
    // the null-positive escape hatch must be the corrupted anchors'
    // signal, not fixture-wide noise: clean anchors sit inside their
    // label's cluster, so their probes must (almost) always contain a
    // same-label positive — if nulls were rampant the hatch would be
    // vacuous
    val cleanNullPos = rows.count { case (id, (posId, _), _, _) =>
      !corrupted(id) && posId == -1L }
    assert(cleanNullPos <= rows.length / 20,
      s"$cleanNullPos clean anchors have null positives — the " +
        "null-positive mislabel signal would be noise")
  }

  test("q203 IVF matryoshka: >= 0.9 per-row agreement parity with q200 on the clustered fixture") {
    val emb = ClusteredEmbeddings.fixture(spark)
      .select(col("vec_id"), col("embedding"))
    val exact = LabelQualityQueries.matryoshkaAgreement(emb, 16)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val rows = LabelQualityQueries.ivfMatryoshkaAgreement(emb, 16)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(rows.length === exact.size, "IVF form dropped query vectors")
    val matching = rows.count { case (id, agree) => exact(id) == agree }
    val parity = matching.toDouble / rows.length
    assert(parity >= 0.9, s"IVF/exact agreement parity $parity < 0.9")
  }

  test("q203 keeps q200's prefix/suffix discrimination under IVF candidates") {
    def planted(signalLo: Int, signalHi: Int) = spark.range(200)
      .selectExpr("id as vec_id",
        s"""transform(sequence(1, 64), j -> cast(
            CASE WHEN j >= $signalLo AND j <= $signalHi
              THEN sin((id % 8) * 131 + j) + 0.05 * sin(id * 7919 + j * 13)
              ELSE 0.01 * sin(id * 37 + j) END as float)) as embedding""")
      .localCheckpoint(true)
    def sameClusterFrac(emb: org.apache.spark.sql.DataFrame): Double = {
      val rows = LabelQualityQueries.ivfMatryoshkaAgreement(emb, 16)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      rows.count { case (q, nn) => q % 8 == nn % 8 }.toDouble / rows.length
    }
    val prefixFrac = sameClusterFrac(planted(1, 16))
    val suffixFrac = sameClusterFrac(planted(49, 64))
    assert(prefixFrac >= 0.95,
      s"prefix-informative corpus must keep its neighborhoods ($prefixFrac)")
    assert(suffixFrac <= 0.4,
      s"suffix-informative corpus must lose its neighborhoods ($suffixFrac)")
  }

  test("q200 discriminates prefix-informative from suffix-informative embeddings") {
    // Planted clusters whose signal lives ONLY in dims 1..16 (prefix)
    // or ONLY in dims 49..64 (suffix); the other dims carry 1% noise.
    // Exact top-1 id agreement is noise-fragile, so the pin is the
    // SEMANTIC claim: under prefix truncation, the retrieved neighbor
    // still lands in the query's cluster iff the prefix carries the
    // structure.
    def planted(signalLo: Int, signalHi: Int) = spark.range(200)
      .selectExpr("id as vec_id",
        s"""transform(sequence(1, 64), j -> cast(
            CASE WHEN j >= $signalLo AND j <= $signalHi
              THEN sin((id % 8) * 131 + j) + 0.05 * sin(id * 7919 + j * 13)
              ELSE 0.01 * sin(id * 37 + j) END as float)) as embedding""")
      .localCheckpoint(true)
    def sameClusterFrac(emb: org.apache.spark.sql.DataFrame): Double = {
      val rows = LabelQualityQueries.matryoshkaAgreement(emb, 16)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      rows.count { case (q, nn) => q % 8 == nn % 8 }.toDouble / rows.length
    }
    val prefixFrac = sameClusterFrac(planted(1, 16))
    val suffixFrac = sameClusterFrac(planted(49, 64))
    assert(prefixFrac >= 0.95,
      s"prefix-informative corpus must keep its neighborhoods ($prefixFrac)")
    assert(suffixFrac <= 0.4,
      s"suffix-informative corpus must lose its neighborhoods ($suffixFrac)")
  }

  test("q247 confident learning: planted flips land off-diagonal; abstain band works") {
    import spark.implicits._
    // separable score: class 1 clusters at 0.9, class 0 at 0.1, two
    // FLIPPED labels (high score labeled 0, low labeled 1), one
    // mid-band point (s=0.5) that must ABSTAIN.
    //   t1 = mean s over y=1 = (0.9·10 + 0.1) / 11 ≈ 0.8273
    //   t0 = mean (1−s) over y=0 = (0.9·10 + 0.1) / 11 ≈ 0.8273
    // so s=0.9 rows clear t1 only, s=0.1 rows clear t0 only, and the
    // 0.5 row clears neither → NULL yhat
    val rows = (1 to 10).map(_ => (0.9, 1)) ++ (1 to 10).map(_ => (0.1, 0)) ++
      Seq((0.9, 0), (0.1, 1), (0.5, 0))
    val r = LabelQualityQueries.confidentLearning(rows.toDF("s", "y"))
      .collect().head
    assert(r.getLong(2) === 23L)  // n_rows
    assert(r.getLong(3) === 22L)  // the 0.5 point abstained
    assert(r.getLong(4) === 10L)  // c00: clean zeros
    assert(r.getLong(5) === 1L)   // c01: the flipped high-score zero
    assert(r.getLong(6) === 1L)   // c10: the flipped low-score one
    assert(r.getLong(7) === 10L)  // c11: clean ones
    assert(r.getDouble(8) === 0.090909) // 2/22 at the 6dp round: flips only
  }

  test("q247 on a degenerate constant score reports exactly half noise") {
    import spark.implicits._
    // s = 0.5 for everyone, labels alternating: both thresholds are
    // 0.5, every row clears both with zero margins → the documented
    // tie goes to class 1 → c01 = c11 = 50, noise_rate = 0.5 exactly.
    // This is the fixture regime in miniature (noise 0.4982 at
    // sf0.01): CL must NOT invent structure where there is none.
    val rows = (0 until 100).map(i => (0.5, i % 2))
    val r = LabelQualityQueries.confidentLearning(rows.toDF("s", "y"))
      .collect().head
    assert(r.getLong(3) === 100L)
    assert(r.getLong(5) === 50L)  // c01
    assert(r.getLong(7) === 50L)  // c11
    assert(r.getDouble(8) === 0.5)
  }
}
