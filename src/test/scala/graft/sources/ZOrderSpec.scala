package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.ZOrderKey

/** Pins the z-order layout's two claims: the interleave expression is
  * bit-exact, and the clustered layout actually concentrates a
  * non-leading-column filter into fewer files than a linear sort —
  * the property parquet footer-stats skipping monetizes at scale.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  test("interleave2 matches a per-bit reference implementation") {
    def reference(a: Long, b: Long): Long =
      (0 until 31).foldLeft(0L) { (acc, i) =>
        acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong() & 0x7FFFFFFFL
      val b = rnd.nextLong() & 0x7FFFFFFFL
      assert(ZOrderKey.interleave2(a, b) === reference(a, b), s"($a,$b)")
    }
    // order of low coordinates is preserved along each axis
    assert(ZOrderKey.interleave2(1, 0) < ZOrderKey.interleave2(2, 0))
    assert(ZOrderKey.interleave2(0, 1) < ZOrderKey.interleave2(0, 2))
  }

  test("z_order_key stays in codegen through a parquet scan") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_zk_codegen"
    spark.range(100).selectExpr("id AS a", "id * 3 AS b")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(ZOrderKey.zOrderKey(col("a"), col("b")).as("zk"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  private def filesTouched(df: DataFrame): Long =
    df.select(input_file_name()).distinct().count()

  test("suppkey filter touches fewer files under z-order than linear sort") {
    val lin = ZOrderedTables.linear(spark, sf)
    val zor = ZOrderedTables.zordered(spark, sf)
    // layouts hold identical data
    assert(lin.count() === zor.count())
    val pred = col("l_suppkey") === 2
    val linFiles = filesTouched(lin.filter(pred))
    val zorFiles = filesTouched(zor.filter(pred))
    // linear layout sorts by partkey, so suppkey=2 rows land everywhere;
    // z-order confines them to the files owning that y-band
    assert(zorFiles < linFiles,
      s"z-order must cluster the non-leading column: z=$zorFiles linear=$linFiles")
    // and the box query's rows (q88's shape) stay a strict file subset too
    val box = col("l_partkey") < 60 && col("l_suppkey") === 2
    assert(filesTouched(zor.filter(box)) <= zorFiles)
  }
}
