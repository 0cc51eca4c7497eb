package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.{Components, Dedup}

/** Measured evidence for the SCALING.md cliff-1 mitigation
  * (`Dedup.minHashLshPairs(maxBucket)`): CrossoverBench's amplified
  * corpora have near-dup clusters of bounded size M, but the cliff is
  * a SINGLE giant duplicate class — the copied-everywhere boilerplate
  * page that puts C docs into one (band, hash) bucket in every band,
  * where the candidate join pays 32·C²/2 and the verifier C²/2 exact
  * intersections. This probe plants exactly that: the sf base corpus
  * plus a C-doc identical clique, timed uncapped vs capped at the
  * same threshold, with the clique's component recall under the cap
  * reported next to the times (a cap that broke the clique apart
  * would be a correctness loss, not a tradeoff — OR-amplified bands
  * each keep a different ~cap subset, so it must stay ONE component).
  *
  * With a 5th argument S > 0 the probe plants the MIXED regime the
  * TextSpec adversarial fixture pins at toy scale: the C-doc clique
  * plus S satellites sharing a 13-token prefix (J = 11/25 = 0.44 to
  * the clique and to each other — true pairs at 0.4, but not members
  * of the exact-dup class), so the overfull buckets hold two distinct
  * similarity classes. Cross-pair ground truth is analytic
  * (C·S + S(S−1)/2); the probe reports capped cross-pair recall and
  * the component count over all planted docs next to the times.
  *
  * Usage: runMain graft.tools.CapProbe <sfDir> <cap> <reps> <C1,C2,...> [S]
  */
object CapProbe {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, capStr, repsStr, sizesStr) = args.take(4)
    val cap = capStr.toInt
    val reps = repsStr.toInt
    val sizes = sizesStr.split(",").map(_.trim.toInt)
    val nSats = if (args.length > 4) args(4).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val base = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val cliqueText =
      "repeated boilerplate page content scraped from everywhere " +
        "again and again across every mirror of the crawl"

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        dt
      }
      println(f"[cap] $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }

    // mixed regime: the clique text carries the shared 13-token prefix
    // so satellites ride its overfull buckets whenever a band's minhash
    // rows land in the prefix (same construction as TextSpec's fixture)
    val common = (0 until 13).map(i => s"cmn$i").mkString(" ")
    val mixedCliqueText = common + " kq0 kq1 kq2 kq3 kq4 kq5 kq6"

    sizes.foreach { c =>
      val clique = spark.range(c)
        .select((col("id") + 10000000L).as("doc_id"),
          lit(if (nSats > 0) mixedCliqueText else cliqueText).as("text"))
      val sats = spark.range(nSats.toLong)
        .select((col("id") + 20000000L).as("doc_id"),
          concat(lit(common), lit(" "), concat_ws(" ",
            (0 until 7).map(j =>
              concat(lit("s"), col("id"), lit(s"q$j"))): _*)).as("text"))
      val corpus =
        if (nSats > 0) base.unionByName(clique).unionByName(sats)
        else base.unionByName(clique)
      println(s"[cap] --- clique C=$c sats S=$nSats over ${sfDir} base ---")
      time(s"uncapped_C$c")(Dedup.minHashLshPairs(corpus, 0.4))
      time(s"capped${cap}_C$c")(
        Dedup.minHashLshPairs(corpus, 0.4, maxBucket = Some(cap)))
      // recall under the cap, at the granularity that matters
      // downstream: the clique must stay ONE dedup component
      val cappedPairs = Dedup
        .minHashLshPairs(corpus, 0.4, maxBucket = Some(cap))
        .filter(col("doc_a") >= 10000000L && col("doc_b") >= 10000000L)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .localCheckpoint(false)
      val nPairs = cappedPairs.count()
      val comp = Components.connectedComponents(cappedPairs)
      val nComponents = comp.select(col("component")).distinct().count()
      val nPresent = comp.select(col("node")).distinct().count()
      println(s"[cap] capped clique pairs=$nPairs " +
        s"(uncapped would be ${c.toLong * (c - 1) / 2}), " +
        s"members in pairs=$nPresent/${c + nSats}, components=$nComponents")
      if (nSats > 0) {
        val nCross = cappedPairs
          .filter(col("src") >= 20000000L || col("dst") >= 20000000L)
          .count()
        val trueCross = c.toLong * nSats + nSats.toLong * (nSats - 1) / 2
        println(f"[cap] mixed cross pairs kept=$nCross/$trueCross " +
          f"(recall ${nCross.toDouble / trueCross}%.3f)")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
