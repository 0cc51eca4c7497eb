package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables._
import graft.text.{Components, Dedup, TextAnalysis => TA}

/** Round-4 curation wave: the two compositions that close the loop
  * between the pairwise/near-dup machinery and corpus emission —
  * semantic (embedding-space) dedup end-to-end, and per-source token
  * budgeting. Both follow the catalog's scale discipline: components
  * run in O(log n) star rounds, budgets are one window per source.
  */
object CurationQueries {

  def queries: Seq[GraftQuery] =
    Seq(q132SemanticDedup, q133TokenBudget, q134IncrementalAdmission,
      q135LmQualityFilter)

  /** Semantic dedup end-to-end: exact cosine near-dup pairs over the
    * embedding corpus (q46's ground truth) → connected components
    * ([[graft.text.Components]], large-star/small-star) → every vector
    * labeled with its dedup group and a keeper flag (min vec_id per
    * component). This is q68's text-space pipeline transplanted to
    * embedding space — the "semantic dedup" pass an LLM curation
    * pipeline runs AFTER lexical dedup to catch paraphrases that share
    * no n-grams. At 100 TB the pair source swaps to
    * [[graft.text.Dedup.embeddingDupPairsLsh]] (bucketed) with the
    * same downstream plan; the exact all-pairs form here is the
    * oracle-checkable ground truth, per the q26/q27 precedent.
    */
  val q132SemanticDedup = GraftQuery(
    "q132_semantic_dedup",
    "embedding near-dup pairs → components → per-vector dedup group + keeper",
    Some("""WITH RECURSIVE e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dup AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4),
      edges AS (SELECT va AS s, vb AS d FROM dup
        UNION ALL SELECT vb, va FROM dup),
      walk(n, r) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT g.d, w.r FROM walk w JOIN edges g ON g.s = w.n),
      comp AS (SELECT n AS vec_id, MIN(r) AS component FROM walk GROUP BY 1)
      SELECT vec_id, component,
        CAST(CASE WHEN vec_id = component THEN 1 ELSE 0 END AS INTEGER)
          AS is_keeper
      FROM comp ORDER BY vec_id"""),
    (s, d) => {
      val pairs = Dedup.embeddingDupPairs(embeddings(s, d), 0.4)
        .select(col("vec_a").as("src"), col("vec_b").as("dst"))
      val cc = Components.connectedComponents(pairs)
      embeddings(s, d).select(col("vec_id"))
        .join(cc.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left_outer")
        .select(col("vec_id"),
          coalesce(col("component"), col("vec_id")).as("component"))
        .withColumn("is_keeper",
          (col("vec_id") === col("component")).cast("int"))
        .orderBy(col("vec_id"))
    })

  /** Cross-corpus LM quality scoring (the CCNet/KenLM pattern): train a
    * Laplace-smoothed unigram LM on a TRUSTED reference slice (every
    * 4th source — the "wikipedia" proxy), then score EVERY document's
    * mean negative log-likelihood under it, with OOV tokens counted
    * and smoothed to 1/(T+V). This differs from q71 (self-scored LM,
    * no smoothing needed) exactly where production differs: the scorer
    * and the scored corpus are different distributions, so unseen
    * tokens must cost probability mass, and a low score means "looks
    * like the reference", not "typical of itself". Plan: ONE tokenize
    * projection feeds both the reference counts and the scoring join
    * (map-side, nothing to checkpoint); the LM is a vocab-sized table
    * joined on term (broadcast when the vocab fits), the totals ride
    * as a broadcast 1-row aggregate.
    */
  val q135LmQualityFilter = GraftQuery(
    "q135_lm_quality_filter",
    "Laplace unigram LM trained on trusted sources scores all docs (+OOV)",
    Some("""WITH toks AS (
        SELECT doc_id, source,
          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        FROM documents),
      ref AS (
        SELECT term, COUNT(*) AS c FROM toks
        WHERE CAST(substr(source, 4) AS INT) % 4 = 0 GROUP BY 1),
      st AS (SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM ref) AS t,
                    (SELECT COUNT(*) FROM ref) AS v)
      SELECT k.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN r.c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_oov,
        ROUND(-SUM(ln((COALESCE(r.c, 0) + 1.0) / (st.t + st.v)))
          / COUNT(*) + 1e-9, 4) AS nll
      FROM toks k LEFT JOIN ref r USING (term) CROSS JOIN st
      GROUP BY 1 ORDER BY 1"""),
    (s, d) => lmScore(documents(s, d),
      isTrusted = substring(col("source"), 4, 10).cast("int") % 4 === 0)
      .orderBy(col("doc_id")))

  /** The q135 plan over any (doc_id, source, text) frame: Laplace
    * unigram NLL under the LM trained on `isTrusted` rows. Exposed so
    * CurationSpec can exercise the OOV smoothing path on crafted docs
    * (the fixture's sources share one vocabulary, so n_oov is 0
    * there). */
  def lmScore(docs: org.apache.spark.sql.DataFrame,
              isTrusted: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val ref = toks.where(isTrusted)
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val st = ref.agg(sum(col("c")).as("t"), count(lit(1)).as("v"))
    toks.join(ref, Seq("term"), "left_outer")
      .crossJoin(broadcast(st))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c").isNull, 1).otherwise(0)).cast("long").as("n_oov"),
        round(-sum(log((coalesce(col("c"), lit(0)) + 1.0)
            / (col("t") + col("v")))) / count(lit(1)) + 1e-9, 4)
          .as("nll"))
  }

  /** Incremental corpus admission: dedup an INCOMING batch against the
    * EXISTING corpus — the operation a continuously-growing training
    * corpus runs on every ingest, where re-deduplicating the whole
    * corpus (q68) would be O(corpus) per batch. The probe is
    * one-directional ([[graft.text.Dedup.nearDupAgainst]]): incoming
    * shingles join the existing side's shingle table, so cost scales
    * with the batch; each incoming doc is admitted or rejected with
    * its best existing match. The batch split here is deterministic
    * (doc_id % 5) so both engines derive identical sides.
    */
  val q134IncrementalAdmission = GraftQuery(
    "q134_incremental_admission",
    "admit/reject an incoming batch against the existing corpus (best near-dup)",
    Some("""WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
            i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingles
        FROM toks WHERE len(t) >= 3),
      ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh
        FROM sh),
      cand AS (
        SELECT i.doc_id, o.doc_id AS dup_of, COUNT(*) AS inter,
          MIN(i.n_sh) AS n_i, MIN(o.n_sh) AS n_e
        FROM ex i JOIN ex o ON i.sh = o.sh
        WHERE i.doc_id % 5 = 0 AND o.doc_id % 5 <> 0
        GROUP BY 1, 2),
      flagged AS (
        SELECT doc_id, dup_of,
          ROUND(inter * 1.0 / (n_i + n_e - inter), 4) AS jaccard
        FROM cand WHERE inter * 1.0 / (n_i + n_e - inter) >= 0.4),
      best AS (
        SELECT doc_id, dup_of, jaccard, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY jaccard DESC, dup_of) AS rk
        FROM flagged)
      SELECT d.doc_id,
        CASE WHEN b.doc_id IS NULL THEN 'admit' ELSE 'reject' END AS status,
        b.dup_of, b.jaccard
      FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
      LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
      ORDER BY d.doc_id"""),
    (s, d) => {
      val docs = documents(s, d)
      val flagged = Dedup.nearDupAgainst(
        docs.where(col("doc_id") % 5 =!= 0),
        docs.where(col("doc_id") % 5 === 0), 0.4)
      docs.where(col("doc_id") % 5 === 0).select(col("doc_id"))
        .join(flagged, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          when(col("dup_of").isNull, "admit").otherwise("reject").as("status"),
          col("dup_of"), col("jaccard"))
        .orderBy(col("doc_id"))
    })

  /** Token budget per source for the sampler — fixture sources carry
    * ~1.1–1.7k tokens, so 600 genuinely cuts (~half of each source's
    * docs survive at every SF). */
  val SourceBudget = 600L

  /** Per-source token budgeting: draw documents in deterministic
    * hash order (md5 of doc_id — rerun-identical, no RNG state, the
    * q101 discipline) until each source's running token total reaches
    * its budget; a document is kept iff its FIRST token fits
    * (start-offset semantics, exactly q102's packing rule). This is
    * the "cap each domain's contribution" step of LLM data mixing —
    * q60/q101 cap by document COUNT or fraction, this caps by what
    * training actually consumes: tokens. One window per source = one
    * shuffle; a pathologically large source serializes into one task's
    * running sum, at which point shard it first like q102 packs
    * (hash-shard, budget/shards per shard).
    */
  val q133TokenBudget = GraftQuery(
    "q133_token_budget_sample",
    s"hash-ordered per-source sampling to a $SourceBudget-token budget",
    Some(s"""WITH t AS (
        SELECT doc_id, source,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
            AS tok,
          substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hk
        FROM documents),
      c AS (
        SELECT doc_id, source, tok,
          CAST(COALESCE(SUM(tok) OVER (PARTITION BY source
            ORDER BY hk, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum
        FROM t)
      SELECT source, doc_id, tok, cum
      FROM c WHERE cum < $SourceBudget ORDER BY source, doc_id"""),
    (s, d) => {
      val toks = documents(s, d).select(col("doc_id"), col("source"),
        TA.tokenCount(col("text")).cast("long").as("tok"),
        substring(md5(col("doc_id").cast("string")), 1, 8).as("hk"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("hk"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      toks
        .withColumn("cum", coalesce(sum(col("tok")).over(w), lit(0L)))
        .where(col("cum") < SourceBudget)
        .select(col("source"), col("doc_id"), col("tok"), col("cum"))
        .orderBy(col("source"), col("doc_id"))
    })
}
