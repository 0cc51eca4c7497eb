package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.{Catalog, DoubleSums}

/** Inventory generator for the order-dependent double-SUM emission
  * class (round-11 verdict #2): prints, for every catalog query, the
  * Sum/Average aggregate sites whose input is inexact (float/double)
  * — the shape whose partial-aggregation association order is
  * width-dependent on Spark and scan-order-dependent on DuckDB
  * (the q246 catch, COVERAGE.md round-11). The committed classification
  * lives in [[graft.queries.DoubleSums.registry]]; DoubleSumLintSpec
  * enforces that this scan and the registry agree exactly, so this
  * tool is the human-facing view of the same detector (one walker,
  * two consumers — they cannot drift).
  *
  * Usage: DoubleSumScan <sfDir>
  */
object DoubleSumScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Bench
      .configure(SparkSession.builder().master("local[8]"), "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Catalog.all.foreach { q =>
      val sites =
        try DoubleSums.sites(q.run(spark, sfDir))
        catch { case e: Exception => Seq(s"CONSTRUCTION FAILED: $e") }
      if (sites.nonEmpty) {
        println(s"== ${q.name}")
        sites.foreach(s => println(s"   $s"))
      }
    }
    spark.stop()
  }
}
