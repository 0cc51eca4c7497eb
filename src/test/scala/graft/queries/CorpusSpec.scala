package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins for the corpus-quality/sketch wave (q80–q83) beyond the
  * DuckDB oracle: the sketch-merge identity and ANN recall, which no
  * SQL oracle can check.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  test("q82: HLL day-sketch union equals the single-pass sketch and tracks exact") {
    val row = Catalog.all.find(_.name == "q82_hll_merge").get
      .run(spark, sf).collect().head
    val merged = row.getAs[Long]("merged_distinct")
    val direct = row.getAs[Long]("direct_distinct")
    val exact = row.getAs[Long]("exact_distinct")
    // union is lossless at equal lgK: merging per-day sketches must
    // reproduce the single-pass sketch exactly (the incremental-rollup
    // contract), and the estimate stays within HLL's error envelope
    assert(merged === direct, s"merged=$merged direct=$direct")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
  }

  test("q83: IVF ANN join finds the exact nearest neighbor for most vectors") {
    import graft.functions.VectorOps.dot_product
    import graft.text.Similarity
    val emb = graft.model.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    // brute-force exact top-1 (the ground truth the IVF path approximates)
    val w = Window.partitionBy(col("a")).orderBy(col("cos").desc, col("b"))
    val exact = emb.as("x").crossJoin(emb.select(
        col("vec_id").as("b_id"), col("v").as("bv")))
      .where(col("vec_id") =!= col("b_id"))
      .select(col("vec_id").as("a"), col("b_id").as("b"),
        (dot_product(col("v"), col("bv")) /
          (sqrt(dot_product(col("v"), col("v"))) *
            sqrt(dot_product(col("bv"), col("bv"))))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("a"), col("b").as("exact_nn"))
    val approx = Catalog.all.find(_.name == "q83_ann_join").get
      .run(spark, sf)
      .select(col("q_id").as("a"), col("nn_id"))
    val n = exact.count()
    val hits = exact.join(approx, Seq("a"))
      .where(col("exact_nn") === col("nn_id")).count()
    assert(hits.toDouble / n >= 0.6, s"recall ${hits.toDouble / n} ($hits/$n)")
    // and every reported neighbor is a real corpus vector, never self
    assert(approx.where(col("a") === col("nn_id")).count() === 0)
  }

  test("q220: checkpoint identities — last point is the full corpus, growth is monotone") {
    val rows = Catalog.all.find(_.name == "q220_heaps_law").get
      .run(spark, sf).collect()
    assert(rows.length === 8)
    val vocab = rows.map(_.getAs[Long]("vocab"))
    val cum = rows.map(_.getAs[Long]("cum_tokens"))
    // monotone by construction (first_doc thresholds only ever admit)
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    assert(cum.zip(cum.tail).forall { case (a, b) => a < b })
    // the 8th checkpoint IS max(doc_id) → totals must equal a direct
    // independent recount of the whole corpus
    import graft.model.Tables
    val words = Tables.documents(spark, sf).select(col("doc_id"),
      posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "w")))
    val wl = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = words
      .withColumn("w2", lead(col("w"), 1).over(wl))
      .withColumn("w3", lead(col("w"), 2).over(wl))
      .where(col("w3").isNotNull)
      .select(concat_ws(" ", col("w"), col("w2"), col("w3")).as("g"))
    assert(cum.last === grams.count())
    assert(vocab.last === grams.distinct().count())
    // a saturating-vocab unit would give β = 0 (the word-unit trap this
    // query's scaladoc records); the 3-gram unit must actually grow
    val beta = rows.head.getAs[Double]("beta_hat")
    assert(beta > 0.3 && beta < 1.0, s"beta $beta")
  }

  test("q221: deciles partition each source evenly and norm_ref is the like-decile mean") {
    val rows = Catalog.all.find(_.name == "q221_quantile_norm").get
      .run(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(0))
    import graft.model.Tables
    val srcCounts = Tables.documents(spark, sf).groupBy(col("source"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum === srcCounts(src))
      // NTILE evenness: bucket sizes differ by at most one
      val ns = rs.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, s"$src buckets $ns")
    }
    // the normalized reference of decile d = mean over sources of that
    // decile's raw means (recomputed from the output itself)
    rows.groupBy(_.getAs[Int]("decile")).foreach { case (d, rs) =>
      val want = rs.map(_.getAs[Double]("raw_mean")).sum / rs.length
      val got = rs.head.getAs[Double]("norm_ref")
      assert(math.abs(got - want) < 1e-3, s"decile $d: $got vs $want")
    }
  }

  test("q274 stylometry: identical sources cos 1, disjoint alphabets absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcabc", "sA"), (2L, "abcabc", "sB"), (3L, "xyzxyz", "sC"))
      .toDF("doc_id", "text", "source")
    val r = CorpusQueries.stylometry(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(3)).toMap
    assert(r(("sA", "sB")) === 1.0)   // identical gram vectors
    assert(!r.contains(("sA", "sC"))) // no shared gram, no row
    assert(!r.contains(("sB", "sC")))
  }
}