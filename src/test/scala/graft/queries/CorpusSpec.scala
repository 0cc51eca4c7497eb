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
}
