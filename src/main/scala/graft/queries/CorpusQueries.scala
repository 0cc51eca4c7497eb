package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables._

/** Corpus-quality + sketch-merge wave: the Gopher/C4-style repetition
  * signals, regex scrubbing, mergeable-sketch rollups and the ANN
  * self-join that round out the training-data pipeline family
  * (SURVEY.md §7.6; quality scoring precedent in q23/q71/q72).
  */
object CorpusQueries {

  def queries: Seq[GraftQuery] = Seq(
    q80RepetitionFilter, q81Redaction, q82HllMerge, q83AnnJoin)

  /** Repetition quality signals per document (the Gopher filters'
    * "duplicate n-gram fraction" and "top token fraction"): word
    * 3-grams come from one posexplode + two `lead` windows — NOT from
    * `transform(sequence, ...)` lambdas, which are interpreted AND
    * re-evaluate the split per element (the round-1 184 s shingling
    * trap). Two aggregates (per-token counts for the mode, per-gram
    * distinct for repetition) join on doc_id; each is a plain
    * shuffle-on-doc_id at any corpus size.
    */
  val q80RepetitionFilter = GraftQuery(
    "q80_repetition_filter",
    "per-doc duplicate-3-gram fraction + top-token fraction (Gopher-style)",
    Some("""WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents),
      w AS (SELECT doc_id, unnest(t) AS tok FROM toks),
      tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
      tstats AS (
        SELECT doc_id, MAX(c) AS maxc, CAST(SUM(c) AS BIGINT) AS nw
        FROM tc GROUP BY 1),
      g AS (
        SELECT doc_id, list_transform(range(len(t) - 2),
            i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) AS grams
        FROM toks WHERE len(t) >= 3),
      gstats AS (
        SELECT doc_id, len(grams) AS n3, len(list_distinct(grams)) AS d3
        FROM g)
      SELECT s.doc_id, s.nw,
        ROUND(1 - d3 * 1.0 / n3, 4) AS rep3_frac,
        ROUND(maxc * 1.0 / nw, 4) AS top_tok_frac
      FROM tstats s JOIN gstats USING (doc_id) ORDER BY 1"""),
    (s, d) => {
      val words = documents(s, d).select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
      val tokStats = words
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("maxc"), sum(col("c")).as("nw"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val gramStats = words
        .select(col("doc_id"), concat_ws(" ", col("tok"),
          lead(col("tok"), 1).over(w), lead(col("tok"), 2).over(w)).as("g"),
          lead(col("tok"), 2).over(w).as("t2"))
        .filter(col("t2").isNotNull)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n3"), countDistinct(col("g")).as("d3"))
      tokStats.join(gramStats, Seq("doc_id"))
        .select(col("doc_id"), col("nw"),
          round(lit(1) - col("d3") * lit(1.0) / col("n3"), 4).as("rep3_frac"),
          round(col("maxc") * lit(1.0) / col("nw"), 4).as("top_tok_frac"))
        .orderBy(col("doc_id"))
    })

  /** Regex scrubbing (the PII-redaction shape — emails/phones in
    * production; the fixture corpus is synthetic word-salad, so the
    * pattern targets tokens that actually occur). Everything is
    * scan-stage regex expressions (codegen'd, no shuffle until the
    * tiny per-source rollup): hit counts via `regexp_count`, byte
    * shrinkage by diffing lengths after `regexp_replace`.
    */
  val q81Redaction = GraftQuery(
    "q81_redaction",
    "regex term-redaction counts + byte shrinkage per source",
    Some("""SELECT source,
        COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_extract_all(text, '\b(spark|customer|vector)\b')) )
          AS BIGINT) AS n_hits,
        ROUND(AVG(len(regexp_extract_all(text, '\b(spark|customer|vector)\b')) ), 4)
          AS hits_per_doc,
        CAST(SUM(length(text) -
          length(regexp_replace(text, '\b(spark|customer|vector)\b', '[X]', 'g')))
          AS BIGINT) AS bytes_redacted
      FROM documents GROUP BY 1 ORDER BY 1"""),
    (s, d) => {
      val pat = "\\b(spark|customer|vector)\\b"
      documents(s, d)
        .select(col("source"),
          regexp_count(col("text"), lit(pat)).as("hits"),
          (length(col("text")) -
            length(regexp_replace(col("text"), pat, "[X]"))).as("shrink"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("hits")).as("n_hits"),
          round(avg(col("hits")), 4).as("hits_per_doc"),
          sum(col("shrink")).as("bytes_redacted"))
        .orderBy(col("source"))
    })

  /** Mergeable-sketch rollup: one HLL sketch PER DAY, then
    * `hll_union_agg` merges the day sketches into the month — the
    * incremental-pipeline contract at 100 TB (yesterday's sketches are
    * never recomputed; today's partition adds one). HLL union is
    * lossless at equal lgK, so the merged estimate EQUALS the
    * single-pass sketch estimate — asserted by CorpusSpec, shown here
    * next to the exact count. Rows-only: sketch estimates are
    * engine-specific.
    */
  val q82HllMerge = GraftQuery(
    "q82_hll_merge",
    "daily HLL user sketches merged to a month (== single-pass sketch)",
    None,
    (s, d) => {
      val ev = events(s, d).select(to_date(col("ts")).as("day"), col("user_id"))
      val daily = ev.groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_distinct"))
      val direct = ev.agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("direct_distinct"),
        countDistinct(col("user_id")).as("exact_distinct"))
      merged.crossJoin(direct)
    })

  /** ANN self-join: every embedding finds its approximate nearest
    * neighbor through the IVF cell index ([[graft.text.Ivf]]) — the
    * corpus↔corpus form of q30's query-set top-k. Cost is
    * O(n²·nProbe/nCells) pair evaluations instead of the brute-force
    * n², and the cell column lives in the table layout, so at 100 TB
    * the join is cell-partitioned (co-located) rather than all-pairs.
    * Rows-only (cell assignments are quantizer-seed-specific);
    * CorpusSpec measures recall against the exact top-1.
    */
  val q83AnnJoin = GraftQuery(
    "q83_ann_join",
    "IVF cell-join ANN: approximate nearest neighbor per embedding",
    None,
    (s, d) => graft.text.Ivf
      .ivfCosineTopK(embeddings(s, d), isQuery = lit(true), k = 1,
        nCells = 16, nProbe = 4, maxIter = 8)
      .select(col("q_id"), col("vec_id").as("nn_id"), col("cos"))
      .orderBy(col("q_id")))
}
