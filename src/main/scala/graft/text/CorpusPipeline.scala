package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition a 100 TB
  * pretraining-data run executes as ONE flow — eval holdout → exact
  * dedup → near-dup components → quality gate → decontamination →
  * domain mixture → sequence packing — built from the catalog's
  * individually-oracle-checked stages (q61 keeper semantics, q26/q56
  * near-dup components, q90 quality gate, q89 decontamination, q60
  * mixture coin, q102 packing) so the pipeline can be hash-verified
  * end-to-end as q284_corpus_funnel while each stage stays covered by
  * its own query. This is the corpus twin of
  * [[graft.ml.FlagshipPipeline]] (the reference's forecast flagship,
  * 流行音乐趋势预测.md:1087-1248): the reference pipelines relational →
  * ML stages; a training-data engine pipelines corpus stages, and the
  * same composition discipline applies.
  *
  * Scale shape: every stage is one shuffle-bounded pass — a window
  * over content-hash groups, the PPJoin prefix pair join (or MinHash
  * banding at scale, `useLsh = true`, the q202 regime convention),
  * the O(log n)-round star fixpoint, two token aggregates, one
  * broadcast semi-join against the (fixed-size, external-eval-suite)
  * benchmark shingle set, a scan-side hash coin, and shard-local
  * packing windows. Nothing is all-pairs, nothing funnels through one
  * partition, and every sampling/keeper decision is hash- or
  * window-deterministic so a rerun (or another engine — the oracle)
  * reproduces the corpus byte-identically.
  */
object CorpusPipeline {

  /** Exact 3-gram Jaccard threshold for near-dup merging (q26/q56). */
  val NearDupThreshold = 0.4
  /** Tokens per packed training sequence (q102). */
  val PackBudget = 2048L
  /** Packing shards — the parallelism unit; O(executors) at scale
    * (q102). */
  val PackShards = 8L
  /** doc_id % EvalModulus == 0 → held-out eval/benchmark side. */
  val EvalModulus = 20
  /** Drop a doc when ≥ this fraction of its shingles hit the
    * benchmark set (q89's flag cutoff). */
  val ContaminationCutoff = 0.5

  /** Training-side corpus: eval docs never enter the pipeline. */
  def trainingSide(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % EvalModulus =!= 0)

  /** Held-out eval/benchmark docs (the decontamination reference). */
  def evalSide(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % EvalModulus === 0)

  /** Exact-dedup keepers, q61 semantics: within each normalized
    * content-hash group keep the longest doc, ties → min doc_id. One
    * window over hash groups — parallel over groups, no global sort. */
  def exactKeepers(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs
      .withColumn("content_hash",
        md5(Dedup.normalized(col("text")).cast("binary")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "content_hash")
  }

  /** Near-dup component keepers: pair source → star-forest components
    * ([[Components.componentsOver]]) → longest-doc keeper per
    * component (ties → min doc_id, the q61 convention again). `pairs`
    * is (doc_a, doc_b) from either regime. */
  def componentKeepers(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comp = Components.componentsOver(docs,
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val w = Window.partitionBy(col("component"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.join(comp, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "component")
  }

  /** q90's first-failing-filter classification, the single source of
    * truth shared by the q90 catalog query and the pipeline's quality
    * stage: input needs (doc_id, text) plus passthrough columns;
    * output appends `reason` ∈ {too_short, too_long, repetitive,
    * stopword_heavy, pass}. Two token aggregates + one join back —
    * every doc gets a reason (an empty text still yields one
    * empty-string token, so the signal join is total). */
  def withQualityReason(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val sig = words
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tok"),
        (max(col("c")) * lit(1.0) / sum(col("c"))).as("top_frac"),
        (sum(when(col("tok").isin("the", "a"), col("c")).otherwise(0)) *
          lit(1.0) / sum(col("c"))).as("stop_frac"))
    val reason = when(col("n_tok") < 30, "too_short")
      .when(col("n_tok") > 95, "too_long")
      .when(col("top_frac") > 0.15, "repetitive")
      .when(col("stop_frac") > 0.12, "stopword_heavy")
      .otherwise("pass")
    docs.join(sig.select(col("doc_id"), reason.as("reason")), Seq("doc_id"))
  }

  /** Decontamination filter, q89 semantics: a doc is dropped when ≥
    * [[ContaminationCutoff]] of its distinct 3-gram shingles appear in
    * the benchmark shingle set. `shingles` is a prebuilt
    * (doc_id, sh, …) table covering at least `docs` (extra doc_ids are
    * ignored by the join); docs too short to shingle can't be
    * contaminated and pass through. `bench` is the distinct benchmark
    * shingle column — a FIXED eval suite at any corpus scale, hence
    * broadcast. */
  def decontaminated(docs: DataFrame, shingles: DataFrame,
                     bench: DataFrame): DataFrame = {
    val hits = shingles.select(col("doc_id"), col("sh"))
      .join(broadcast(bench.select(col("sh")).withColumn("hit", lit(1))),
        Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
    docs.join(hits, Seq("doc_id"), "left")
      .filter(col("n_hit").isNull ||
        col("n_hit") * lit(1.0) / col("n_sh") < ContaminationCutoff)
      .drop("n_sh", "n_hit")
  }

  /** q60's deterministic mixture coin: first two md5 hex digits of
    * "m:<doc_id>" — uniform, engine-portable, reproducible across
    * reruns/retries (rand() is none of those). */
  def mixtureCoinHex(docId: Column): Column =
    substring(md5(concat(lit("m:"), docId.cast("string")).cast("binary")), 1, 2)

  /** q60's per-source keep threshold: sources tier by their numeric
    * suffix mod 4 → keep rates 1, 1/2, 1/4, 1/8. */
  def mixtureThreshold(source: Column): Column = {
    val tier = pmod(substring(source, 4, 10).cast("int"), lit(4))
    when(tier === 0, "ff").when(tier === 1, "7f")
      .when(tier === 2, "3f").otherwise("1f")
  }

  /** Domain-mixture sampling: scan-side hash coin, no shuffle. */
  def mixtureKept(docs: DataFrame): DataFrame =
    docs.filter(mixtureCoinHex(col("doc_id")) <= mixtureThreshold(col("source")))

  /** The q102 packing plan over any (doc_id, text) frame: start-offset
    * packing to [[PackBudget]] tokens within [[PackShards]] hash
    * shards → (shard, bin, n_docs, tokens). True first-fit is
    * inherently sequential; start-offset packing is one window per
    * shard, so 100 TB packs as N independent linear scans with a
    * single shuffle on the shard key, and a re-pack after upstream
    * dedup reproduces byte-identical sequence boundaries. */
  def packedBins(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      (col("doc_id") % PackShards).as("shard"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("cum", coalesce(sum(col("tok")).over(w), lit(0L)))
      .groupBy(col("shard"), floor(col("cum") / PackBudget).as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
      .orderBy(col("shard"), col("bin"))
  }

  /** Every surviving-doc frame of the pipeline, keyed by funnel-stage
    * label (prefix letters encode pipeline order), plus the packed-bin
    * frame under "g_packed". `useLsh = false` runs the exact
    * PPJoin-prefix pair source (the oracle-checkable ground truth);
    * `true` swaps in MinHash-LSH banding — the 100 TB regime (q202
    * convention: identical downstream plan, pair source exchanged).
    * Stage frames are lazily checkpointed: each feeds both its
    * successor stage and its own funnel aggregate, and Spark has no
    * cross-subtree CSE. */
  def stages(docs0: DataFrame, useLsh: Boolean = false): Seq[(String, DataFrame)] = {
    val base = trainingSide(docs0
        .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")).cast("long")))
      .localCheckpoint(false)
    val ek = exactKeepers(base).localCheckpoint(false)
    // one shingle derivation feeds the pair join AND decontamination
    val shEk = Dedup.shingleRows(ek).localCheckpoint(false)
    val pairs =
      if (useLsh) Dedup.minHashLshPairs(ek, NearDupThreshold, shingleTable = Some(shEk))
      else Dedup.jaccardPairsPrefix(ek, NearDupThreshold, shingleTable = Some(shEk))
    val nk = componentKeepers(ek, pairs).localCheckpoint(false)
    val qk = withQualityReason(nk).filter(col("reason") === "pass")
      .drop("reason").localCheckpoint(false)
    val bench = Dedup.shingleRows(evalSide(docs0)).select(col("sh")).distinct()
    val dk = decontaminated(qk, shEk, bench).localCheckpoint(false)
    val mk = mixtureKept(dk).localCheckpoint(false)
    Seq("a_ingest" -> base, "b_exact_dedup" -> ek, "c_near_dedup" -> nk,
      "d_quality" -> qk, "e_decontaminated" -> dk, "f_mixed" -> mk,
      "g_packed" -> packedBins(mk))
  }

  /** The curation funnel report: docs and whitespace tokens surviving
    * each stage, ordered by pipeline position; the final row counts
    * packed SEQUENCES (bins) and their tokens — which must equal
    * f_mixed's tokens exactly (packing conserves tokens; the spec pins
    * it). This single frame hash-verifies the whole composition
    * against the chained DuckDB oracle. */
  def funnel(docs0: DataFrame, useLsh: Boolean = false): DataFrame = {
    val st = stages(docs0, useLsh)
    val stats = st.map {
      case ("g_packed", bins) =>
        bins.agg(count(lit(1)).as("n_docs"),
            sum(col("tokens")).as("n_tokens"))
          .select(lit("g_packed").as("stage"), col("n_docs"), col("n_tokens"))
      case (name, df) =>
        df.agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
    }
    stats.reduce(_.union(_)).orderBy(col("stage"))
  }
}
