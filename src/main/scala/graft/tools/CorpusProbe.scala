package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.sources.SourceLayout
import graft.text.CorpusPipeline

/** End-to-end scale probe for the q284 curation pipeline — the corpus
  * sibling of [[FlagshipProbe]]: amplify the documents fixture M×
  * with a deterministic duplicate STRUCTURE (not just more rows:
  * ~20% of variants are exact copies, ~20% near-copies, the rest
  * distinct — so the dedup stages do M-scaled WORK instead of
  * collapsing the amplification), write it once (_SUCCESS-marked),
  * then run [[CorpusPipeline.stages]] with every stage forced and
  * timed at 1× and M×. The M× run uses the MinHash-LSH pair regime —
  * the honest 100 TB path; 1× runs both regimes so the exact form
  * anchors the comparison.
  *
  * Usage: runMain graft.tools.CorpusProbe [baseSfDir] [M]
  */
object CorpusProbe {

  /** M variants per doc, collision-free doc_ids (doc_id*M + k keeps
    * the %20 eval-holdout and %8 packing-shard structure uniform).
    * Variant class by hash of (doc_id, k): k=0 keeps the original;
    * class<2 → exact copy (exact-dedup load); class<4 → original plus
    * a pad token (near-dup load: shingles differ by ~3 of ~n, Jaccard
    * ≈ (n−2)/(n+1) ≫ 0.4); else every token gets a k-suffixed twist
    * (regex group backreference — distinct shingles across variants,
    * token structure and counts preserved). No RNG anywhere: reruns
    * amplify byte-identically. */
  def amplifyDocs(docs: DataFrame, m: Int): DataFrame = {
    val cls = pmod(xxhash64(col("doc_id"), col("k")), lit(10))
    val text2 = when(col("k") === 0 || cls < 2, col("text"))
      .when(cls < 4, concat(col("text"), lit(" graftpad")))
      .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1x"), col("k"))))
    docs.withColumn("k", explode(sequence(lit(0), lit(m - 1))))
      .select((col("doc_id") * m + col("k")).as("doc_id"),
        text2.as("text"), col("lang"), col("source"),
        length(text2).cast("long").as("n_chars"))
  }

  def main(args: Array[String]): Unit = {
    val baseSfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ampDir = s"${SourceLayout.root("graft_corpus_amp", baseSfDir)}/m$m"
    SourceLayout.writeOnce(s"$ampDir/documents.parquet") {
      amplifyDocs(Tables.documents(spark, baseSfDir), m)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$ampDir/documents.parquet")
    }

    def probe(tag: String, sfDir: String, useLsh: Boolean): Unit = {
      def timed[A](stage: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[probe] $tag $stage%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      val regime = if (useLsh) "lsh" else "exact"
      // the components fixpoint executes EAGERLY while stages()
      // assembles the per-doc flag frame — time the construction as
      // its own line or the near-dedup work reads as free
      val stages = timed(s"$regime/build+fixpoint") {
        CorpusPipeline.stages(Tables.documents(spark, sfDir), useLsh)
      }
      // every stage frame is a filter over ONE lazily-checkpointed
      // flag frame: the first count() pays the remaining pipeline
      // (quality/decon/mixture joins + checkpoint materialization),
      // later stages are flag-filter scans of the pinned blocks
      stages.foreach { case (name, df) =>
        timed(s"$regime/$name") { println(s"[probe] $tag   rows = ${df.count()}") }
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      // the unforced end-to-end wall: one funnel action
      timed(s"$regime/funnel-e2e") {
        CorpusPipeline.funnel(Tables.documents(spark, sfDir), useLsh)
          .collect().foreach(r => println(s"[probe] $tag   $r"))
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }

    probe("1x   ", baseSfDir, useLsh = false)
    probe("1x   ", baseSfDir, useLsh = true)
    probe(s"${m}x".padTo(5, ' '), ampDir, useLsh = true)
    spark.stop()
  }
}
