package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.Dedup

/** Builder-side stage profiler for jaccardPairsPrefix — not part of the
  * driver contract. NOTE: the standalone "verify" stage here times the
  * REJECTED per-pair array_intersect variant — kept as the measured
  * evidence (522 k candidates → 415 s at sf0.1, t=0.4) for why the live
  * Dedup.jaccardPairsPrefix verifies with a count-based join instead.
  * Usage: runMain graft.tools.PpjoinProfile [sfDir] [threshold]
  */
object PpjoinProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pp] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    val t = args.lift(1).map(_.toDouble).getOrElse(0.4)
    val W = org.apache.spark.sql.expressions.Window
    val sh = time("shingle checkpoint") {
      Dedup.shingleRows(docs, 3).localCheckpoint(false)
    }
    println(s"[pp] shingle rows = ${sh.count()}")
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    println(s"[pp] distinct shingles = ${time("dfreq")(dfreq.count())}")
    val prefix = sh.join(dfreq, Seq("sh"))
      .withColumn("rk", row_number().over(
        W.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .filter(col("rk") <= col("n_sh") - ceil(lit(t) * col("n_sh")) + 1)
      .select(col("doc_id"), col("sh"))
      .localCheckpoint(false)
    println(s"[pp] prefix rows = ${time("prefix")(prefix.count())}")
    val cand = prefix.as("x").join(prefix.as("y"), Seq("sh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    println(s"[pp] candidates = ${time("cand")(cand.count())}")
    val shArr = sh.groupBy(col("doc_id")).agg(collect_list(col("sh")).as("shingles"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val jac = inter / (size(col("sh_a")) + size(col("sh_b")) - inter)
    val out = cand
      .join(shArr.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(shArr.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .filter(jac >= t)
    println(s"[pp] verified pairs = ${time("verify")(out.count())}")
    println(s"[pp] full query rows = ${time("full jaccardPairsPrefix")(
      Dedup.jaccardPairsPrefix(docs, t).count())}")
    println(s"[pp] plain q26 rows = ${time("plain jaccardPairs")(
      Dedup.jaccardPairs(docs, t).count())}")
    spark.stop()
  }
}
