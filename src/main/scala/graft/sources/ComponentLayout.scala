package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables
import graft.text.Components

/** Write-once dedup-component layout — the [[BucketedTables]] (q51)
  * storage treatment applied to the star-round fixed point (round-5
  * verdict item #4): q56/q129/q68/q140 all consume the SAME
  * `dedupComponents(documents, 0.4)` assignment, and each used to
  * re-run the pair join + O(log n) component rounds from scratch —
  * ~2.5 s × 4 of every bench pass at sf0.1 for byte-identical results.
  *
  * At 100 TB this is exactly how the pipeline runs anyway: component
  * ids are corpus METADATA written once per ingest wave (like the
  * bucketed/Z-ordered fact tables) and every downstream pass — keeper
  * selection, leakage-safe splitting, yield accounting — reads the
  * assignment instead of re-deriving the graph. The parquet round-trip
  * is exact (two long columns), so consumers are value-identical to
  * calling [[Components.dedupComponents]] directly — QueriesSpec pins
  * that equality.
  *
  * The directory name embeds the spec (threshold, shingle width,
  * algorithm version) — the [[BucketedTables]] fingerprint discipline:
  * changing any of them orphans the old directory rather than silently
  * re-reading stale assignments.
  */
object ComponentLayout {

  /** Bump when the component/pair derivation changes semantically. */
  private val LayoutVersion = 1

  private def dir(sfDir: String, threshold: Double): String = {
    // full threshold value in the key (the PairsLayout rule): a rounded
    // form would let 0.4 and 0.404 share a directory
    val spec = s"t${threshold.toString.replace('.', '_').replace('-', 'm')}" +
      s"_sh3_v$LayoutVersion"
    s"${SourceLayout.root("graft_components", sfDir)}/$spec"
  }

  /** (doc_id, component) for every document at `sfDir` — computed and
    * written once per (sfDir, threshold), read from the layout
    * afterwards (any session). */
  def dedupComponents(s: SparkSession, sfDir: String,
                      threshold: Double): DataFrame = {
    val d = dir(sfDir, threshold)
    SourceLayout.writeOnce(d) {
      // the one-time build itself reads the shingle layout — the two
      // storage layers chain (corpus → shingle index → components)
      Components.dedupComponents(Tables.documents(s, sfDir), threshold,
          shingleTable = Some(ShingleLayout.shingles(s, sfDir)))
        .write.mode("overwrite").parquet(d)
    }
    s.read.parquet(d)
  }

  /** "Yesterday's" assignment for the incremental-maintenance path
    * (q164): the corpus minus the doc_id%10 ∈ {8,9} admission wave,
    * components over its OWN pairs only. Persisted write-once because
    * that is the operational semantics being modeled — yesterday's
    * assignment IS a stored table (this very layout after yesterday's
    * ingest); only the wave merge runs at admission time.
    */
  def yesterdayComponents(s: SparkSession, sfDir: String,
                          threshold: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = dir(sfDir, threshold) + "_wave8"
    SourceLayout.writeOnce(d) {
      val docs = Tables.documents(s, sfDir)
        .filter(pmod(col("doc_id"), lit(10)) < 8)
      val pairs = PairsLayout.jaccardPairs(s, sfDir, threshold)
        .filter(pmod(col("doc_a"), lit(10)) < 8 &&
          pmod(col("doc_b"), lit(10)) < 8)
      Components.componentsOver(docs,
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        .select(col("doc_id").as("node"), col("component"))
        .write.mode("overwrite").parquet(d)
    }
    s.read.parquet(d)
  }
}
