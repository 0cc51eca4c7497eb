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
}
