package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.Dedup

/** Builder-side A/B harness for the MinHash signature implementations —
  * not part of the driver contract. Times the full minHashLshPairs
  * query with (a) the round-1 form (k seeded xxhash64 min-aggregates)
  * and (b) the MinHashAgg single-pass form, interleaved twice in one
  * JVM to cancel warmup.
  *
  * Usage: runMain graft.tools.MinHashAb [sfDir]
  */
object MinHashAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def reset(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }

    // round-1 signature form, inlined (k seeded full-string hashes/row)
    def lshPairsWide(): Long = {
      val k = 32; val bands = 16; val r = k / bands
      val sh = Dedup.shingleRows(Tables.documents(spark, sfDir), 3).localCheckpoint(false)
      val sig = sh.groupBy(col("doc_id"))
        .agg(min(col("n_sh")).as("n_sh"),
          (0 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"h$i")): _*)
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band_idx"),
          xxhash64((b * r until (b + 1) * r).map(i => col(s"h$i")): _*).as("band_hash"))
      }
      val buckets = sig
        .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
        .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
      val cand = buckets.as("x")
        .join(buckets.as("y"), Seq("band_idx", "band_hash"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val shArr = sh.groupBy(col("doc_id")).agg(collect_list(col("sh")).as("shingles"))
      val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
      val jac = inter / (size(col("sh_a")) + size(col("sh_b")) - inter)
      cand
        .join(shArr.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
        .join(shArr.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
        .filter(jac >= 0.4)
        .count()
    }

    def lshPairsAgg(): Long =
      Dedup.minHashLshPairs(Tables.documents(spark, sfDir), 0.4).count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ab] $label%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      reset()
    }

    for (round <- 1 to 2) {
      time(s"wide$round")(lshPairsWide())
      time(s"agg$round")(lshPairsAgg())
    }
    spark.stop()
  }
}
