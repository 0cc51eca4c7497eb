package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.RollingMinHash.rolling_min_hash
import graft.model.Tables._
import graft.text.{Dedup, Similarity, TextAnalysis => TA}

/** Training-data-pipeline operators over the `documents` and
  * `embeddings` fixtures — SURVEY.md §7.6 north star. Oracle SQL where
  * the op is ANSI-expressible — including the hash-arithmetic family
  * (rolling/poly hashes q29/q53/q157, and since round 8 SimHash q28
  * via [[XxHashOracle]]); the remaining sketch/LSH ops (MinHash
  * banding, approx sketches) are rows-only and property-tested in
  * ScalaTest instead (bucketing geometry is engine-specific).
  */
object TextQueries {

  def queries: Seq[GraftQuery] = Seq(
    q22DocTokens, q23DocQuality, q24LangId, q25ExactDedup, q26NgramJaccard,
    q27MinHashLsh, q28SimHashPairs, q29Fingerprint, q30CosineTopK,
    q31EmbeddingNorms, q32ApproxDistinct, q46EmbeddingDups, q53Winnowing,
    q54JaccardPrefix, q67Int8Quantize, q93BpeishTokens,
    q151ExactSubstrSpans, q152ExactSubstrCut, q154IncrementalSubstr,
    q157ExactSubstrHashed, q160IncrementalCut, q165SnmBlocking,
    q169ContainmentDedup, q204EditVerifyDedup, q213Readability,
    q241Rake, q262Textrank, q277Mtld)

  private val stopList = TA.Stopwords.map(w => s"'$w'").mkString(", ")

  val q22DocTokens = GraftQuery(
    "q22_doc_tokens",
    "whitespace token count per document",
    Some("""SELECT doc_id, lang,
      CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      n_chars
      FROM documents ORDER BY doc_id"""),
    (s, d) => documents(s, d)
      .select(col("doc_id"), col("lang"),
        TA.tokenCount(col("text")).cast("long").as("n_tokens"),
        col("n_chars"))
      .orderBy(col("doc_id")))

  /** Token-budget estimation: whitespace tokens vs BPE-ish pre-tokens
    * ([[TA.BpeishPattern]] — letter/digit/punct runs, the GPT-2
    * pre-tokenizer shape minus lookahead so DuckDB's RE2 runs the
    * same pattern) plus chars-per-token "fertility". Both counts are
    * scan-stage regex expressions; the rollup is a tiny per-lang
    * aggregate.
    */
  val q93BpeishTokens = GraftQuery(
    "q93_bpeish_tokens",
    "whitespace vs BPE-ish pre-token counts + fertility per lang",
    Some(s"""SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
          AS ws_tokens,
        CAST(SUM(len(regexp_extract_all(lower(trim(text)),
          ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))) AS BIGINT) AS bpeish_tokens,
        CAST(ROUND(CAST(CAST(SUM(n_chars) * 1.0 / SUM(len(regexp_extract_all(lower(trim(text)),
          ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS chars_per_token
      FROM documents GROUP BY 1 ORDER BY 1"""),
    (s, d) => documents(s, d)
      .select(col("lang"), col("n_chars"),
        TA.tokenCount(col("text")).cast("long").as("ws"),
        TA.bpeishTokenCount(col("text")).cast("long").as("bp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bp")).as("bpeish_tokens"),
        round(sum(col("n_chars")) * lit(1.0) / sum(col("bp")), 4)
          .as("chars_per_token"))
      .orderBy(col("lang")))

  val q23DocQuality = GraftQuery(
    "q23_doc_quality",
    "per-source avg token/punct/stopword/quality metrics",
    Some(s"""WITH m AS (
        SELECT source,
          len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
          len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
              t -> t IN ($stopList))) AS n_stop,
          length(regexp_replace(text, '[^.!?,;:]', '', 'g')) * 1.0
            / length(text) AS punct_ratio
        FROM documents)
      SELECT source, COUNT(*) AS n_docs,
        ROUND(AVG(n_tok * 1.0), 4) AS avg_tokens,
        ROUND(AVG(punct_ratio), 4) AS avg_punct_ratio,
        CAST(ROUND(CAST(CAST(AVG(n_stop * 1.0 / n_tok) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS avg_stopword_ratio,
        CAST(ROUND(CAST(CAST(AVG(least(n_tok * 1.0 / 100.0, 1.0) * 0.3
          + (n_stop * 1.0 / n_tok) * 0.4 + (1.0 - punct_ratio) * 0.3) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE)
          AS avg_quality
      FROM m GROUP BY 1 ORDER BY 1"""),
    (s, d) => documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(TA.tokenCount(col("text")).cast("double")), 4).as("avg_tokens"),
        round(avg(TA.punctRatio(col("text"))), 4).as("avg_punct_ratio"),
        round(avg(TA.stopwordRatio(col("text"))), 4).as("avg_stopword_ratio"),
        round(avg(TA.qualityScore(col("text"))), 4).as("avg_quality"))
      .orderBy(col("source")))

  val q24LangId = GraftQuery(
    "q24_lang_id",
    "marker-word language-ID heuristic per document",
    Some("""WITH t AS (
        SELECT doc_id, lang,
          regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
      s AS (SELECT doc_id, lang,
        len(list_filter(w, x -> x = 'the'))
          + len(list_filter(w, x -> x = 'and'))
          + len(list_filter(w, x -> x = 'is')) AS en,
        len(list_filter(w, x -> x = 'el'))
          + len(list_filter(w, x -> x = 'la'))
          + len(list_filter(w, x -> x = 'de')) AS es,
        len(list_filter(w, x -> x = 'der'))
          + len(list_filter(w, x -> x = 'und'))
          + len(list_filter(w, x -> x = 'die')) AS de
        FROM t)
      SELECT doc_id, lang,
        CASE WHEN en >= es AND en >= de THEN 'en'
             WHEN es >= de THEN 'es' ELSE 'de' END AS lang_pred
      FROM s ORDER BY doc_id"""),
    // sort-then-project (the q277 double-evaluation note): langId is
    // the whole cost of this map-only query, and a sort ABOVE it would
    // evaluate it once more in the range-sampling pass
    (s, d) => documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("lang"),
        TA.langId(col("text")).as("lang_pred")))

  val q25ExactDedup = GraftQuery(
    "q25_exact_dedup",
    "exact dedup groups by md5 of normalized text",
    Some("""SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        AS content_hash,
      MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
      FROM documents GROUP BY 1 ORDER BY 1"""),
    (s, d) => Dedup.exactDupGroups(documents(s, d))
      .orderBy(col("content_hash")))

  val q26NgramJaccard = GraftQuery(
    "q26_ngram_jaccard",
    "exact 3-gram Jaccard near-dup pairs (threshold 0.4)",
    Some(s"""WITH ${OracleCtes.shinglePairs}
      SELECT doc_a, doc_b,
        CAST(ROUND(CAST(CAST(inter * 1.0 / (n_a + n_b - inter) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS jaccard
      FROM pairs WHERE inter * 1.0 / (n_a + n_b - inter) >= 0.4
      ORDER BY doc_a, doc_b"""),
    (s, d) => Dedup.jaccardPairs(documents(s, d), 0.4,
      shingleTable = Some(graft.sources.ShingleLayout.shingles(s, d)))
      .orderBy(col("doc_a"), col("doc_b")))

  /** PPJoin prefix-filtered exact Jaccard at the technique's native
    * regime (t=0.8, near-identical duplicates): prefixes span only
    * (1−t)·|d|+1 ≈ 20% of each doc, so the self-join fan-out collapses
    * — the plan that replaces jaccardPairs' full shingle join at
    * 100 TB. The oracle (q26's SQL at 0.8) proves the prefix filter
    * loses nothing. With the length + positional filters in place
    * (round-5; see jaccardPairsPrefix) this form beats the naive join
    * at sf0.1 already (~2.6 s vs ~3.5 s warm) — the scale claim is
    * measured, not asserted. */
  val q54JaccardPrefix = GraftQuery(
    "q54_jaccard_prefix",
    "prefix-filtered exact 3-gram Jaccard pairs at t=0.8 (PPJoin plan)",
    Some(s"""WITH ${OracleCtes.shinglePairs}
      SELECT doc_a, doc_b,
        CAST(ROUND(CAST(CAST(inter * 1.0 / (n_a + n_b - inter) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS jaccard
      FROM pairs WHERE inter * 1.0 / (n_a + n_b - inter) >= 0.8
      ORDER BY doc_a, doc_b"""),
    (s, d) => Dedup.jaccardPairsPrefix(documents(s, d), 0.8,
      shingleTable = Some(graft.sources.ShingleLayout.shingles(s, d)))
      .orderBy(col("doc_a"), col("doc_b")))

  /** Oracle-checked against q26's EXACT Jaccard SQL: the LSH output is
    * candidate pairs verified with exact pair-local Jaccard, so
    * precision is 1 by construction, and the banding is deterministic
    * (xxhash64, no RNG) with measured recall 1.0 on the gate corpus —
    * the sketch is purely the candidate-pruning mechanism, the emitted
    * rows are engine-independent. TextSpec keeps the recall assertion
    * as the early-warning if banding parameters ever change.
    *
    * TRIAGE if this row ever goes red with rows_match=false and FEWER
    * Spark rows than oracle rows: banding is probabilistic — a pair
    * sitting exactly at the 0.4 threshold is missed with ~0.4%
    * probability per pair (deterministic per corpus, but a new fixture
    * or SF can flip one). That is a banding-parameter/fixture property,
    * NOT an engine bug: re-check recall in TextSpec and either raise
    * the band count or accept the corpus change before touching the
    * join logic. */
  val q27MinHashLsh = GraftQuery(
    "q27_minhash_lsh_pairs",
    "MinHash+LSH banded near-dup pairs, Jaccard-verified (threshold 0.4)",
    Some(s"""WITH ${OracleCtes.shinglePairs}
      SELECT doc_a, doc_b,
        CAST(ROUND(CAST(CAST(inter * 1.0 / (n_a + n_b - inter) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS jaccard
      FROM pairs WHERE inter * 1.0 / (n_a + n_b - inter) >= 0.4
      ORDER BY doc_a, doc_b"""),
    (s, d) => Dedup.minHashLshPairs(documents(s, d), 0.4,
      shingleTable = Some(graft.sources.ShingleLayout.shingles(s, d)))
      .orderBy(col("doc_a"), col("doc_b")))

  /** Asymmetric containment ([[graft.text.Dedup.containmentPairs]]):
    * catches the engulfed-document duplicate Jaccard structurally
    * misses (a doc quoted inside a longer one scores |A∩B|/|A| ≈ 1
    * but tiny Jaccard). Reads the same write-once ShingleLayout as
    * q26/q54; the oracle derives both directions from the shared
    * pairs CTE, proving the one-aggregate-two-projections plan. */
  val q169ContainmentDedup = GraftQuery(
    "q169_containment_dedup",
    "asymmetric 3-gram containment pairs (|A∩B|/|A| ≥ 0.6)",
    Some(s"""WITH ${OracleCtes.shinglePairs},
      c AS (
        SELECT doc_a AS contained, doc_b AS container,
          inter * 1.0 / n_a AS cont FROM pairs
        UNION ALL
        SELECT doc_b, doc_a, inter * 1.0 / n_b FROM pairs)
      SELECT contained, container, ROUND(cont, 4) AS containment
      FROM c WHERE cont >= 0.6 ORDER BY 1, 2"""),
    (s, d) => Dedup.containmentPairs(documents(s, d), 0.6,
      shingleTable = Some(graft.sources.ShingleLayout.shingles(s, d)))
      .orderBy(col("contained"), col("container")))

  /** GRADUATED from rows-only (round-8, the round-7 verdict #6 probe;
    * q29's PolyHash precedent): "simhash values are xxhash64-specific"
    * stopped being a blocker once the oracle replays XXH64 itself —
    * [[XxHashOracle]] reimplements Spark's seeded hash as HUGEINT
    * mod-2⁶⁴ arithmetic, the per-bit ±1 votes and sign fold replicate
    * [[graft.functions.SimHashAgg]], and the pair set needs no recall
    * argument at all: the 4-chunk pigeonhole band is EXACT for
    * hamming ≤ 3 (any such pair shares an untouched 16-bit chunk), so
    * the oracle's brute-force O(n²) pair join over 64-bit values —
    * fine at gate scale, never the Spark plan — must produce the
    * identical rows. Value-exact: doc pairs AND their hamming
    * distances, both engines' bit_count over the same two's-complement
    * longs. */
  val q28SimHashPairs = GraftQuery(
    "q28_simhash_pairs",
    "SimHash pairs within hamming distance 3 (pigeonhole-banded join)",
    Some(s"""WITH toks AS (
        SELECT doc_id,
          unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
        FROM documents),
      ${XxHashOracle.ctes("toks", Seq("doc_id"))},
      bits AS (SELECT unnest(range(0, 64)) AS bit),
      -- a doc holding any out-of-domain (>=16-byte, hu NULL) token
      -- gets sh64 NULL and drops out of the pair join entirely: any
      -- pair Spark emits for it then mismatches (red gate). Without
      -- the nbad gate, CASE's ELSE -1 would swallow the NULL into a
      -- concrete wrong simhash (round-8 review finding). The flag
      -- rides the SAME votes aggregation — a second xh reference
      -- would make DuckDB inline (re-evaluate) the whole hash chain.
      votes AS (
        SELECT doc_id, bit,
          SUM(CASE WHEN (hu // (1::HUGEINT << bit)) % 2 = 1
            THEN 1 ELSE -1 END) AS v,
          SUM(CASE WHEN hu IS NULL THEN 1 ELSE 0 END) AS nbad
        FROM xh CROSS JOIN bits GROUP BY 1, 2),
      sh AS (
        SELECT doc_id,
          CASE WHEN MAX(nbad) > 0 THEN NULL
            ELSE SUM(CASE WHEN v > 0 THEN 1::HUGEINT << bit
              ELSE 0::HUGEINT END) END AS s
        FROM votes GROUP BY 1),
      sg AS (SELECT doc_id,
          CAST(CASE WHEN s >= 9223372036854775808
            THEN s - 18446744073709551616 ELSE s END AS BIGINT) AS sh64
        FROM sh)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.sh64, b.sh64)) AS INTEGER) AS hamming
      FROM sg a JOIN sg b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh64, b.sh64)) <= 3
      ORDER BY 1, 2"""),
    (s, d) => Dedup.simHashPairs(documents(s, d), 3)
      .orderBy(col("doc_a"), col("doc_b")))

  /** GRADUATED from rows-only (round-5): the rolling hash is plain
    * base-31 polynomial arithmetic mod 2⁶⁴ (window hash ≡
    * Σ bᵢ·31^(k−1−i), read off a signed long), so the oracle replicates
    * it VALUE-exactly in DuckDB — HUGEINT recurrence with a mod after
    * each step, then a two's-complement fold before the signed MIN.
    * This is an arithmetic guarantee, not a measured-recall property:
    * any corpus, any SF, same values (corpus is ASCII, so `ascii(c)` ==
    * the UTF-8 byte; a non-ASCII fixture would need byte-level access).
    */
  val q29Fingerprint = GraftQuery(
    "q29_fingerprint",
    "rolling min-hash fingerprint per document (native codegen expression)",
    Some("""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      cs AS (SELECT doc_id, n,
        list_transform(range(1, n + 1), i -> CAST(ascii(text[i]) AS HUGEINT)) AS c
        FROM d),
      wins AS (
        SELECT doc_id,
          unnest(CASE WHEN n < 16 THEN [c]
            ELSE list_transform(range(1, n - 14), w -> c[w : w + 15]) END) AS win
        FROM cs),
      hh AS (SELECT doc_id,
        list_reduce(win, (a, b) -> (a * 31 + b) % 18446744073709551616) AS r
        FROM wins),
      sg AS (SELECT doc_id,
        CASE WHEN r >= 9223372036854775808
          THEN r - 18446744073709551616 ELSE r END AS s
        FROM hh)
      SELECT doc_id, CAST(MIN(s) AS BIGINT) AS fingerprint
      FROM sg GROUP BY doc_id ORDER BY doc_id"""),
    (s, d) => documents(s, d)
      .select(col("doc_id"), rolling_min_hash(col("text"), 16).as("fingerprint"))
      .orderBy(col("doc_id")))

  val q30CosineTopK = GraftQuery(
    "q30_cosine_topk",
    "brute-force exact cosine top-5 neighbors for query vectors (id < 20)",
    Some("""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
      s AS (SELECT q_id, e.vec_id, list_cosine_similarity(qv, v) AS cos
            FROM q, e WHERE e.vec_id != q_id),
      r AS (SELECT q_id, vec_id, cos,
              ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos DESC, vec_id) AS rk
            FROM s)
      SELECT q_id, vec_id, ROUND(cos, 4) AS cos, CAST(rk AS INTEGER) AS rk
      FROM r WHERE rk <= 5 ORDER BY q_id, rk"""),
    (s, d) => Similarity.cosineTopK(embeddings(s, d), col("vec_id") < 20, 5)
      .orderBy(col("q_id"), col("rk")))

  val q31EmbeddingNorms = GraftQuery(
    "q31_embedding_norms",
    "count + avg L2 norm per embedding label",
    Some("""SELECT label, COUNT(*) AS n,
      ROUND(AVG(sqrt(list_sum(list_transform(
        CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS avg_norm
      FROM embeddings GROUP BY 1 ORDER BY 1"""),
    (s, d) => embeddings(s, d)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(Similarity.norm2(Similarity.toDouble(col("embedding")))), 4)
          .as("avg_norm"))
      .orderBy(col("label")))

  /** Embedding-cosine near-dup dedup, exact form (native codegen'd
    * dot/norm — graft.functions.VectorOps). The LSH-bucketed scale
    * variant is Dedup.embeddingDupPairsLsh (spec-measured recall). */
  val q46EmbeddingDups = GraftQuery(
    "q46_embedding_dups",
    "exact cosine near-dup pairs over embeddings (threshold 0.4)",
    Some("""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.4
      ORDER BY 1, 2"""),
    (s, d) => Dedup.embeddingDupPairs(embeddings(s, d), 0.4)
      .orderBy(col("vec_a"), col("vec_b")))

  /** Int8 scalar-quantization round-trip error — the 4×-compression
    * layout an ANN index stores at 100 TB, with its reconstruction
    * cost measured in-engine. [[graft.functions.Int8RoundTrip]] is one
    * codegen'd loop (ties rounded away from zero so the oracle's SQL
    * ROUND reproduces it exactly); the error norm is assembled from
    * native dot products only — err² = v·v + d·d − 2·v·d — with the
    * same left-to-right summation as the oracle's list arithmetic.
    */
  val q67Int8Quantize = GraftQuery(
    "q67_int8_quantize",
    "int8 round-trip reconstruction error per embedding (vec_id < 100)",
    Some("""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id < 100),
      s AS (SELECT vec_id, v,
        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
      d AS (SELECT vec_id, v,
        CASE WHEN scale > 0 THEN list_transform(v, x ->
          greatest(least(round(x / scale), 127.0), -127.0) * scale)
        ELSE v END AS deq FROM s)
      SELECT vec_id, CAST(len(v) AS INTEGER) AS dim,
        ROUND(sqrt(list_sum(list_transform(v, x -> x * x))
          + list_sum(list_transform(deq, x -> x * x))
          - 2 * list_sum(list_transform(range(len(v)), i -> v[i+1] * deq[i+1])))
          + 1e-9, 4) AS err
      FROM d ORDER BY vec_id"""),
    (s, d) => {
      import graft.functions.VectorOps.{dot_product, int8_round_trip}
      embeddings(s, d)
        .filter(col("vec_id") < 100)
        .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
        .withColumn("deq", int8_round_trip(col("v")))
        .select(col("vec_id"), size(col("v")).as("dim"),
          round(sqrt(dot_product(col("v"), col("v"))
            + dot_product(col("deq"), col("deq"))
            - lit(2) * dot_product(col("v"), col("deq"))) + 1e-9, 4).as("err"))
        .orderBy(col("vec_id"))
    })

  /** Rows-only (xxhash64-specific values): winnowing fingerprint set per
    * document — completes the fingerprint family over q29's single
    * rolling min-hash. TextSpec pins parity against an independent
    * driver-side reimplementation. */
  /** GRADUATED from rows-only (round-5): the gram hash moved from
    * xxhash64 to [[graft.functions.PolyHash]] (the winnowing paper
    * prescribes "any rolling hash"), whose base-31 mod-2⁶⁴ arithmetic
    * the oracle replicates value-exactly in DuckDB; the window-min
    * selection (rightmost on hash ties) replays as a bounded rn-range
    * self-join — MIN(h) per window start, then MAX(pos) among the
    * window's rows at that minimum. Same arithmetic-guarantee footing
    * as q29, valid at any corpus/SF (ASCII corpus ⇒ ascii(c) == byte).
    */
  val q53Winnowing = GraftQuery(
    "q53_winnowing",
    "winnowing fingerprints (k=3-gram poly-hashes, window 4) per document",
    Some("""WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents),
      g0 AS (
        SELECT doc_id, u.i AS pos,
          t[u.i+1] || ' ' || t[u.i+2] || ' ' || t[u.i+3] AS gram
        FROM toks, unnest(range(len(t) - 2)) AS u(i)
        WHERE len(t) >= 3),
      hh AS (
        SELECT doc_id, pos,
          list_reduce(list_transform(range(1, length(gram) + 1),
            i -> CAST(ascii(gram[i]) AS HUGEINT)),
            (a, b) -> (a * 31 + b) % 18446744073709551616) AS r
        FROM g0),
      hs AS (SELECT doc_id, pos,
        CASE WHEN r >= 9223372036854775808
          THEN r - 18446744073709551616 ELSE r END AS h
        FROM hh),
      g AS (SELECT doc_id, pos, h,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
        COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
        FROM hs),
      wm AS (
        SELECT a.doc_id, a.rn AS ws, MIN(b.h) AS mh
        FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.rn BETWEEN a.rn AND a.rn + 3
        WHERE a.rn <= GREATEST(a.n_grams - 3, 1)
        GROUP BY 1, 2),
      sel AS (
        SELECT wm.doc_id, MAX(b.pos) AS pos, wm.mh AS h
        FROM wm JOIN g b ON b.doc_id = wm.doc_id
          AND b.rn BETWEEN wm.ws AND wm.ws + 3 AND b.h = wm.mh
        GROUP BY wm.doc_id, wm.ws, wm.mh)
      SELECT DISTINCT doc_id, CAST(pos AS INTEGER) AS pos, CAST(h AS BIGINT) AS h
      FROM sel ORDER BY doc_id, pos"""),
    (s, d) => Dedup.winnowFingerprints(documents(s, d), 3, 4)
      .orderBy(col("doc_id"), col("pos")))

  /** Rows-only: HLL sketch values are engine-specific — the 100 TB twin
    * of q08's exact distinct (SURVEY.md §2.4 note). */
  val q32ApproxDistinct = GraftQuery(
    "q32_approx_distinct",
    "approx_count_distinct (HLL) next to the exact count",
    None,
    (s, d) => events(s, d)
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("event_id")).as("approx_events"),
        count(lit(1)).as("n_rows")))

  /** Shared oracle scaffold for the ExactSubstr family: 8-gram
    * positions → a caller-supplied `dup(doc_id, p)` criterion →
    * interval union per doc via the cumulative-max sweep (islands
    * split where pos jumps past running-max-end + 1). Mirrors the
    * [[graft.text.Dedup]] span operators step for step; q151/q152
    * plug in the corpus-wide ≥2-occurrences criterion, q154 the
    * asymmetric incoming-vs-corpus one. */
  private def substrCtes(dupDef: String) = s"""toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents),
      gpos AS (
        SELECT doc_id, t, unnest(range(len(t) - 7)) AS p
        FROM toks WHERE len(t) >= 8),
      grams AS (
        SELECT doc_id, p, array_to_string(t[p + 1 : p + 8], ' ') AS sh
        FROM gpos),
      $dupDef,
      swept AS (
        SELECT doc_id, p, p + 7 AS e,
          MAX(p + 7) OVER (PARTITION BY doc_id ORDER BY p
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
        FROM dup),
      isl AS (
        SELECT doc_id, p, e,
          SUM(CASE WHEN prev_e IS NULL OR p > prev_e + 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY p) AS island
        FROM swept),
      spans AS (
        SELECT doc_id, MIN(p) AS span_start, MAX(e) - MIN(p) + 1 AS span_len
        FROM isl GROUP BY doc_id, island)"""

  /** The corpus-wide criterion (q151/q152): ≥2 occurrences anywhere. */
  private val exactSubstrCte = substrCtes("""dup AS (
        SELECT doc_id, p FROM (
          SELECT doc_id, p, COUNT(*) OVER (PARTITION BY sh) AS occ
          FROM grams)
        WHERE occ >= 2)""")

  /** Corpus-wide ExactSubstr duplicated spans (Lee et al. 2022) — the
    * pair-free sibling of q107's pair-scoped diagonal islands: which
    * token ranges of each doc are duplicated ANYWHERE in the corpus.
    * One gram-key shuffle + one doc_id sweep, no pair enumeration —
    * the dedup shape that survives 100 TB near-dup cluster blowup. */
  val q151ExactSubstrSpans = GraftQuery(
    "q151_exact_substr_spans",
    "corpus-duplicated token spans per doc (ExactSubstr interval union)",
    Some(s"""WITH $exactSubstrCte
      SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
        CAST(span_len AS BIGINT) AS span_len
      FROM spans ORDER BY doc_id, span_start"""),
    (s, d) => Dedup.duplicatedSpans(documents(s, d), 8)
      .orderBy(col("doc_id"), col("span_start")))

  /** The removal half of ExactSubstr dedup: drop every token covered by
    * a q151 span and rebuild the surviving text in position order. All
    * docs survive (fully-duplicated ones return n_kept=0, empty text).
    */
  val q152ExactSubstrCut = GraftQuery(
    "q152_exact_substr_cut",
    "ExactSubstr cut: corpus-duplicated spans removed from each doc",
    Some(s"""WITH $exactSubstrCte,
      tok2 AS (
        SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS p
        FROM toks),
      kept AS (
        SELECT k.doc_id, k.p, k.tok FROM tok2 k
        WHERE NOT EXISTS (SELECT 1 FROM spans s
          WHERE s.doc_id = k.doc_id
            AND k.p BETWEEN s.span_start AND s.span_start + s.span_len - 1)),
      agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
          string_agg(tok, ' ' ORDER BY p) AS cleaned_text
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(a.n_kept, 0) AS n_kept,
        COALESCE(a.cleaned_text, '') AS cleaned_text
      FROM documents d LEFT JOIN agg a USING (doc_id)
      ORDER BY d.doc_id"""),
    (s, d) => Dedup.exactSubstrCut(documents(s, d), 8,
      spanTable = Some(graft.sources.SpansLayout.duplicatedSpans(s, d, 8)))
      .orderBy(col("doc_id")))

  /** The executable 100 TB swap-in for q151 (the q143/q144 doctrine:
    * documented swap-ins must RUN, not live in prose): identical span
    * derivation but keyed on xxhash64(gram) — the count/join exchange
    * moves 8 bytes per row instead of ~8 tokens of text. Carries
    * q151's exact oracle: a 64-bit collision could only add a
    * spurious duplicated position, so hashed == exact absent
    * collisions (none at any realistic corpus; a future mismatch here
    * is a collision to triage, not an engine bug — the q27
    * banding-note precedent). */
  val q157ExactSubstrHashed = GraftQuery(
    "q157_exact_substr_hashed",
    "q151's spans with the 8-byte hashed gram key (the 100 TB exchange)",
    Some(s"""WITH $exactSubstrCte
      SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
        CAST(span_len AS BIGINT) AS span_len
      FROM spans ORDER BY doc_id, span_start"""),
    (s, d) => Dedup.duplicatedSpans(documents(s, d), 8, hashedKey = true)
      .orderBy(col("doc_id"), col("span_start")))

  /** Admission-time ExactSubstr (the incremental form a pipeline runs
    * per ingest wave — q134's incremental-admission pattern applied to
    * spans): incoming docs (doc_id % 17 = 0, the fixture wave-split)
    * get spans only where a gram already EXISTS in the corpus side —
    * within-wave duplication deliberately excluded (that's q151's
    * backfill once admitted). Stream-static semi-join shape: the
    * corpus appears only through its deduplicated gram index. */
  val q154IncrementalSubstr = GraftQuery(
    "q154_incremental_substr",
    "admission-time ExactSubstr: incoming-wave spans duplicating the corpus",
    Some(s"""WITH ${substrCtes("""dup AS (
        SELECT g.doc_id, g.p FROM grams g
        JOIN (SELECT DISTINCT sh FROM grams WHERE doc_id % 17 <> 0) x
          USING (sh)
        WHERE g.doc_id % 17 = 0)""")}
      SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
        CAST(span_len AS BIGINT) AS span_len
      FROM spans ORDER BY doc_id, span_start"""),
    (s, d) => {
      val docs = documents(s, d)
      // the corpus side reads its write-once gram index (round 12) —
      // the admission query pays only the incoming wave's tokenize
      Dedup.duplicatedSpansAgainst(
          docs.filter(col("doc_id") % 17 =!= 0),
          docs.filter(col("doc_id") % 17 === 0), 8,
          corpusGrams = Some(graft.sources.SpansLayout.yesterdayGrams(s, d, 8)))
        .orderBy(col("doc_id"), col("span_start"))
    })

  /** The admission pass completed: q154's corpus-duplicating spans CUT
    * from the incoming wave before it lands (detect → remove in one
    * shape — what the pipeline actually admits is the cleaned text).
    * Same anti-range-join + ordered-rebuild mechanics as q152, driven
    * by the asymmetric span source; wave docs that duplicate nothing
    * pass through untouched, fully-corpus-duplicated ones land empty
    * (n_kept = 0) for the admission policy to drop. */
  val q160IncrementalCut = GraftQuery(
    "q160_incremental_cut",
    "admission cut: corpus-duplicating spans removed from the incoming wave",
    Some(s"""WITH ${substrCtes("""dup AS (
        SELECT g.doc_id, g.p FROM grams g
        JOIN (SELECT DISTINCT sh FROM grams WHERE doc_id % 17 <> 0) x
          USING (sh)
        WHERE g.doc_id % 17 = 0)""")},
      tok2 AS (
        SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS p
        FROM toks WHERE doc_id % 17 = 0),
      kept AS (
        SELECT k.doc_id, k.p, k.tok FROM tok2 k
        WHERE NOT EXISTS (SELECT 1 FROM spans s
          WHERE s.doc_id = k.doc_id
            AND k.p BETWEEN s.span_start AND s.span_start + s.span_len - 1)),
      agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
          string_agg(tok, ' ' ORDER BY p) AS cleaned_text
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(a.n_kept, 0) AS n_kept,
        COALESCE(a.cleaned_text, '') AS cleaned_text
      FROM documents d LEFT JOIN agg a USING (doc_id)
      WHERE d.doc_id % 17 = 0
      ORDER BY d.doc_id"""),
    (s, d) => {
      val docs = documents(s, d)
      val incoming = docs.filter(col("doc_id") % 17 === 0)
      Dedup.exactSubstrCut(incoming, 8,
          spanTable = Some(Dedup.duplicatedSpansAgainst(
            docs.filter(col("doc_id") % 17 =!= 0), incoming, 8,
            corpusGrams =
              Some(graft.sources.SpansLayout.yesterdayGrams(s, d, 8)))))
        .orderBy(col("doc_id"))
    })

  /** Sorted-neighborhood blocking (Hernández-Stolfo SNM) — the
    * SORT-based candidate generator, completing the blocking-strategy
    * set next to hash blocking (q25), LSH banding (q27) and prefix
    * filtering (q54): sort the corpus by a normalized key, compare
    * each record only to its w-1 successors. Here blocks are the
    * 2-char key prefix, rank is a per-block window (never a global
    * one — PlanLint's rule; at 100 TB the same shape runs as
    * repartitionByRange + per-partition rank with boundary overlap),
    * and candidates come from two `lead`s, so the pair set is
    * O(n·w) BY CONSTRUCTION — no similarity-skew blowup possible.
    * Verification is token-set Jaccard on the candidate, replayed
    * verbatim by the oracle.
    */
  val q165SnmBlocking = GraftQuery(
    "q165_snm_blocking",
    "sorted-neighborhood (w=3) candidate pairs verified at token-Jaccard 0.5",
    Some("""WITH t AS (
        SELECT doc_id, lower(trim(text)) AS k,
          list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks
        FROM documents),
      b AS (
        SELECT doc_id, k, toks, substr(k, 1, 2) AS blk,
          ROW_NUMBER() OVER (PARTITION BY substr(k, 1, 2)
            ORDER BY k, doc_id) AS rn
        FROM t),
      cand AS (
        SELECT a.doc_id AS ia, c.doc_id AS ib, a.toks AS ta, c.toks AS tb
        FROM b a JOIN b c ON a.blk = c.blk
          AND c.rn - a.rn BETWEEN 1 AND 2),
      sim AS (
        SELECT LEAST(ia, ib) AS doc_a, GREATEST(ia, ib) AS doc_b,
          len(list_intersect(ta, tb)) * 1.0 /
            (len(ta) + len(tb) - len(list_intersect(ta, tb))) AS j
        FROM cand)
      SELECT doc_a, doc_b, ROUND(j, 4) AS sim
      FROM sim WHERE j >= 0.5 ORDER BY 1, 2"""),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = documents(s, d).select(col("doc_id"),
        lower(trim(col("text"))).as("k"),
        array_distinct(split(lower(trim(col("text"))), "\\s+")).as("toks"))
      val w = Window.partitionBy(col("blk")).orderBy(col("k"), col("doc_id"))
      val b = t.withColumn("blk", substring(col("k"), 1, 2))
      val leads = b.select(col("doc_id"), col("toks"),
        lead(col("doc_id"), 1).over(w).as("id1"),
        lead(col("toks"), 1).over(w).as("tk1"),
        lead(col("doc_id"), 2).over(w).as("id2"),
        lead(col("toks"), 2).over(w).as("tk2"))
      val cand = leads
        .select(col("doc_id").as("ia"), col("toks").as("ta"),
          col("id1").as("ib"), col("tk1").as("tb"))
        .union(leads.select(col("doc_id"), col("toks"),
          col("id2"), col("tk2")))
        .where(col("ib").isNotNull)
      val inter = size(array_intersect(col("ta"), col("tb")))
      val j = inter * lit(1.0) /
        (size(col("ta")) + size(col("tb")) - inter)
      cand
        .select(least(col("ia"), col("ib")).as("doc_a"),
          greatest(col("ia"), col("ib")).as("doc_b"), j.as("j"))
        .where(col("j") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("sim"))
        .orderBy(col("doc_a"), col("doc_b"))
    })

  /** Edit-distance VERIFICATION of near-dup candidates — the final
    * exactness gate of a char-level dedup pipeline (Jaccard over
    * 3-gram sets is order-insensitive and can score reshuffled text as
    * a near-dup; bounded Levenshtein is the character-level truth).
    * Plan: candidates come from the shingle-join stream at the q26
    * threshold (the write-once [[graft.sources.ShingleLayout]] — edit
    * distance is NEVER evaluated all-pairs), each pair re-joins its
    * two normalized texts broadcast-free on doc_id, and the distance
    * runs CAPPED (`levenshtein(a, b, 100)` → −1 past the cap): Spark
    * computes the capped form with the banded O(cap·len) algorithm,
    * so per-pair cost is linear in text length, not quadratic — that
    * cap is the 100 TB knob. A pair is a verified dup when the capped
    * distance lands within 20 % of the longer text. The oracle replays
    * the cap as CASE over DuckDB's full `levenshtein` (same
    * unit-cost insert/delete/substitute metric on both engines).
    */
  val q204EditVerifyDedup = GraftQuery(
    "q204_edit_verify_dedup",
    "capped Levenshtein verification of shingle near-dup candidates",
    Some(s"""WITH ${OracleCtes.shinglePairs},
      cand AS (
        SELECT doc_a, doc_b,
          CAST(ROUND(CAST(CAST(inter * 1.0 / (n_a + n_b - inter) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS jaccard
        FROM pairs WHERE inter * 1.0 / (n_a + n_b - inter) >= 0.4),
      t AS (SELECT doc_id, lower(trim(text)) AS nt FROM documents),
      d AS (
        SELECT cand.doc_a, cand.doc_b, cand.jaccard,
          levenshtein(ta.nt, tb.nt) AS ed,
          GREATEST(len(ta.nt), len(tb.nt)) AS mx
        FROM cand
        JOIN t ta ON ta.doc_id = cand.doc_a
        JOIN t tb ON tb.doc_id = cand.doc_b)
      SELECT doc_a, doc_b, jaccard,
        CAST(CASE WHEN ed <= 100 THEN ed ELSE -1 END AS INTEGER)
          AS edit_dist,
        CAST(ROUND(CAST(CAST(CASE WHEN ed <= 100 THEN ed * 1.0 / mx ELSE -1 END AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE)
          AS edit_ratio,
        CAST(CASE WHEN ed <= 100 AND ed * 1.0 / mx <= 0.2 THEN 1 ELSE 0
          END AS INTEGER) AS is_dup
      FROM d ORDER BY doc_a, doc_b"""),
    (s, d) => editVerifyDedup(documents(s, d),
      pairTable = Some(graft.sources.PairsLayout.jaccardPairs(s, d, 0.4)))
      .orderBy(col("doc_a"), col("doc_b")))

  /** The q204 plan over any (doc_id, text) frame — TextSpec pins the
    * cap (−1 past 100 edits), the is_dup boundary, and the operator's
    * reason to exist: a token-reshuffled doc (high Jaccard, high edit
    * distance) must survive candidate generation and FAIL verification.
    * `pairTable` is the write-once [[graft.sources.PairsLayout]] —
    * q204's own logic is the VERIFICATION of candidates, so it reads
    * the materialized pair table like q103/q107/q151 do (q26 stays the
    * live measurement of pair derivation); None keeps the
    * self-contained form. */
  def editVerifyDedup(docs: org.apache.spark.sql.DataFrame,
      cap: Int = 100,
      shingleTable: Option[org.apache.spark.sql.DataFrame] = None,
      pairTable: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val cand = pairTable.getOrElse(
      Dedup.jaccardPairs(docs, 0.4, shingleTable = shingleTable))
    val t = docs.select(col("doc_id"), lower(trim(col("text"))).as("nt"))
    val ed = col("ed")
    val mx = col("mx")
    cand
      .join(t.select(col("doc_id").as("doc_a"), col("nt").as("ta")),
        Seq("doc_a"))
      .join(t.select(col("doc_id").as("doc_b"), col("nt").as("tb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        levenshtein(col("ta"), col("tb"), cap).as("ed"),
        greatest(length(col("ta")), length(col("tb"))).as("mx"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        ed.cast("int").as("edit_dist"),
        round(when(ed >= 0, ed * lit(1.0) / mx).otherwise(lit(-1.0)), 4)
          .as("edit_ratio"),
        (ed >= 0 && ed * lit(1.0) / mx <= 0.2).cast("int").as("is_dup"))
  }

  /** Flesch reading-ease + Flesch–Kincaid grade — the classic
    * readability pair every text-quality pipeline reports next to
    * q23's surface ratios (quality filters like the C4/Gopher rules
    * gate on readability-adjacent statistics). Counts are scan-stage
    * regex/codegen expressions: words = whitespace tokens, sentences =
    * `[.!?]+` runs floored at 1 (the fixture's synthetic text has no
    * terminators — the floor engages there; TextSpec pins real
    * multi-sentence prose), syllables = vowel-group runs with
    * vowelless tokens ("123", "xyz") floored at one syllable each, the
    * standard heuristic both engines express with the same RE2
    * patterns. Zero shuffles — a pure per-row projection.
    */
  val q213Readability = GraftQuery(
    "q213_readability",
    "Flesch reading ease + FK grade per doc (vowel-group syllables)",
    Some("""WITH t AS (
        SELECT doc_id, lower(trim(text)) AS lt FROM documents),
      c AS (
        SELECT doc_id,
          len(regexp_split_to_array(lt, '\s+')) AS w,
          GREATEST(1, len(regexp_extract_all(lt, '[.!?]+'))) AS s,
          len(regexp_extract_all(lt, '[aeiouy]+'))
            + len(list_filter(regexp_split_to_array(lt, '\s+'),
                x -> NOT regexp_matches(x, '[aeiouy]'))) AS syl
        FROM t)
      SELECT doc_id, CAST(w AS BIGINT) AS n_words,
        CAST(s AS BIGINT) AS n_sentences, CAST(syl AS BIGINT) AS n_syllables,
        ROUND(206.835 - 1.015 * w / s - 84.6 * syl / w + 1e-9, 4)
          AS flesch,
        ROUND(0.39 * w / s + 11.8 * syl / w - 15.59 + 1e-9, 4) AS fk_grade
      FROM c ORDER BY doc_id"""),
    // sort BELOW the projection (the q277 double-evaluation note):
    // the regex pipeline is the whole query; output order unchanged
    (s, d) => readability(documents(s, d)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))))

  /** The q213 plan over any (doc_id, text) frame — TextSpec pins a
    * hand-counted two-sentence paragraph and the vowelless-token
    * floor. */
  def readability(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val lt = lower(trim(col("text")))
    val w = size(split(lt, "\\s+"))
    val sArr = greatest(lit(1), size(expr(
      "regexp_extract_all(lower(trim(text)), '[.!?]+', 0)")))
    val syl = size(expr(
      "regexp_extract_all(lower(trim(text)), '[aeiouy]+', 0)")) +
      size(filter(split(lt, "\\s+"), x => !x.rlike("[aeiouy]")))
    docs.select(col("doc_id"),
        w.cast("long").as("n_words"),
        sArr.cast("long").as("n_sentences"),
        syl.cast("long").as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        round(lit(206.835) - lit(1.015) * col("n_words") / col("n_sentences")
          - lit(84.6) * col("n_syllables") / col("n_words") + 1e-9, 4)
          .as("flesch"),
        round(lit(0.39) * col("n_words") / col("n_sentences")
          + lit(11.8) * col("n_syllables") / col("n_words") - lit(15.59)
          + 1e-9, 4).as("fk_grade"))
  }

  /** RAKE keyword extraction — the unsupervised keyword pass a
    * training-data pipeline runs for doc tagging/routing (q57's
    * TF-IDF scores WORDS against the corpus; RAKE scores PHRASES from
    * within-phrase co-occurrence, no idf table needed). Candidate
    * phrases are stopword-delimited runs, long runs chunked at 4
    * words (the stopword-poor synthetic corpus would otherwise
    * produce degenerate 15-word "phrases"; the cap is the documented
    * convention, replayed identically in the oracle). Word score =
    * degree/frequency over the CORPUS phrase table (one shuffle on
    * word); phrase score = Σ word scores, ranked per doc at 9dp (the
    * q215 jw9 tie convention — dust-level score ties collapse before
    * the phrase-string tie-break). Windows are doc-partitioned
    * (doc-bounded, the q213 argument). Output: top phrase per doc for
    * doc_id < 50 (the q57 output-cap convention); the stats remain
    * corpus-wide. On this uniform corpus scores cluster ≈15.2 —
    * honest: RAKE separates documents by topical phrases, and the
    * synthetic corpus has none; TextSpec plants a topical doc where
    * the ranking is meaningful.
    */
  val q241Rake = GraftQuery(
    "q241_rake",
    "RAKE top keyword phrase per doc (stopword-delimited, 4-word chunks)",
    Some(s"""WITH toks AS (
        SELECT doc_id, g.i AS pos, arr[g.i] AS w
        FROM (SELECT doc_id,
            regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
          FROM documents),
        LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS i) g),
      fl AS (
        SELECT doc_id, pos, w,
          w IN ($stopList) AS stop,
          SUM(CASE WHEN w IN ($stopList) THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
        FROM toks),
      np AS (
        SELECT doc_id, run_id, pos, w,
          CAST((ROW_NUMBER() OVER (PARTITION BY doc_id, run_id
            ORDER BY pos) - 1) // 4 AS BIGINT) AS chunk
        FROM fl WHERE NOT stop),
      ph AS (
        SELECT doc_id, run_id, chunk,
          string_agg(w, ' ' ORDER BY pos) AS phrase, COUNT(*) AS plen
        FROM np GROUP BY 1, 2, 3),
      pw AS (
        SELECT np.doc_id, np.run_id, np.chunk, np.w, ph.plen
        FROM np JOIN ph USING (doc_id, run_id, chunk)),
      ws AS (SELECT w, SUM(plen) * 1.0 / COUNT(*) AS wscore
        FROM pw GROUP BY 1),
      ps AS (
        SELECT pw.doc_id, pw.run_id, pw.chunk, SUM(ws.wscore) AS score
        FROM pw JOIN ws USING (w) GROUP BY 1, 2, 3),
      top AS (
        SELECT ps.doc_id, ph.phrase, ps.score,
          ROW_NUMBER() OVER (PARTITION BY ps.doc_id
            ORDER BY ROUND(ps.score, 9) DESC, ph.phrase) AS rn
        FROM ps JOIN ph USING (doc_id, run_id, chunk))
      SELECT doc_id, phrase, ROUND(score, 4) AS score
      FROM top WHERE rn = 1 AND doc_id < 50 ORDER BY 1"""),
    (s, d) => rake(documents(s, d)).where(col("doc_id") < 50)
      .orderBy(col("doc_id")))

  /** The q241 pipeline over any (doc_id, text) frame — TextSpec
    * plants a topical doc and pins the winning phrase. */
  def rake(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wRun = Window.partitionBy(col("doc_id"), col("run_id"))
      .orderBy(col("pos"))
    // spread: the tokenize explosion is the pre-shuffle cost here
    val np = graft.model.Tables.spread(docs, col("doc_id"))
      .select(col("doc_id"), posexplode(
        split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "w")))
      .withColumn("stop", col("w").isInCollection(TA.Stopwords))
      .withColumn("run_id", sum(col("stop").cast("int")).over(wDoc))
      .where(!col("stop"))
      .withColumn("chunk",
        floor((row_number().over(wRun) - 1) / 4).cast("long"))
      .localCheckpoint(false) // feeds the phrase table AND the word join
    val ph = np.groupBy(col("doc_id"), col("run_id"), col("chunk"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("w")))),
        x => x("w")), " ").as("phrase"),
        count(lit(1)).as("plen"))
      .localCheckpoint(false) // feeds pw AND the final phrase lookup
    val pw = np.join(ph, Seq("doc_id", "run_id", "chunk"))
      .select(col("doc_id"), col("run_id"), col("chunk"), col("w"),
        col("plen"))
    val ws = pw.groupBy(col("w"))
      .agg((sum(col("plen")) * 1.0 / count(lit(1))).as("wscore"))
    val ps = pw.join(ws, Seq("w"))
      .groupBy(col("doc_id"), col("run_id"), col("chunk"))
      .agg(sum(col("wscore")).as("score"))
    val wTop = Window.partitionBy(col("doc_id"))
      .orderBy(round(col("score"), 9).desc, col("phrase"))
    ps.join(ph, Seq("doc_id", "run_id", "chunk"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("phrase"), round(col("score"), 4).as("score"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004), corpus-wide:
    * the co-occurrence graph links CONSECUTIVE kept tokens (length ≥ 4
    * — the cheap content-word filter; RAKE's q241 stoplist convention
    * would also work but the length filter keeps the oracle's lambda
    * pure), undirected and deduplicated; scores are two unrolled
    * damped-PageRank rounds from S₀ ≡ 1 (the q222 HITS / q244 PPR
    * unrolling precedent): S(v) = 0.15 + 0.85·Σ_{u∼v} S(u)/deg(u)
    * with unweighted distinct-neighbor degrees. Where RAKE scores
    * phrases within one document, TextRank ranks the corpus's
    * vocabulary by graph centrality — the two standard keyword
    * extractors, now both in the catalog. Top-20 on the 6dp-rounded
    * score (tie → word) via TakeOrdered.
    *
    * Scale: pair generation is per-document (fan-out = doc length),
    * the graph lives on (word, word) distinct edges — one shuffle to
    * dedup, one per round; degree attaches are equi-joins.
    */
  val q262Textrank = GraftQuery(
    "q262_textrank",
    "TextRank top-20 corpus keywords (2 damped-PageRank rounds on the co-occurrence graph)",
    Some("""WITH t AS (
        SELECT doc_id, list_filter(
          regexp_split_to_array(lower(trim(text)), '\s+'),
          w -> length(w) >= 4) AS f
        FROM documents),
      p AS (
        SELECT unnest(list_transform(range(len(f) - 1),
          i -> struct_pack(u := f[i + 1], w := f[i + 2]))) AS pr
        FROM t WHERE len(f) >= 2),
      e AS (
        SELECT DISTINCT LEAST(pr.u, pr.w) AS a, GREATEST(pr.u, pr.w) AS b
        FROM p WHERE pr.u != pr.w),
      und AS (SELECT a AS src, b AS dst FROM e
              UNION ALL SELECT b, a FROM e),
      deg AS (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY 1),
      s1 AS (
        SELECT dst AS node, 0.15 + 0.85 * SUM(1.0 / deg.d) AS s
        FROM und JOIN deg ON und.src = deg.node GROUP BY 1),
      s2 AS (
        SELECT dst AS node, 0.15 + 0.85 * SUM(s1.s / deg.d) AS s
        FROM und JOIN deg ON und.src = deg.node
          JOIN s1 ON und.src = s1.node
        GROUP BY 1)
      SELECT s2.node AS word, CAST(deg.d AS BIGINT) AS deg,
        ROUND(s2.s, 4) AS score
      FROM s2 JOIN deg ON s2.node = deg.node
      ORDER BY ROUND(s2.s, 6) DESC, word LIMIT 20"""),
    (s, d) => textrank(documents(s, d), 20))

  /** The q262 pipeline — TextSpec (TextrankSpec section) hand-traces
    * a 3-word chain where both rounds are pencil arithmetic. */
  def textrank(docs: DataFrame, k: Int): DataFrame = {
    val t = docs.select(col("doc_id"),
      filter(split(lower(trim(col("text"))), "\\s+"),
        w => length(w) >= 4).as("f"))
    val p = t.where(size(col("f")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(f) - 2),
           i -> struct(element_at(f, i + 1) AS u,
                       element_at(f, i + 2) AS w))""")).as("pr"))
    val e = p.where(col("pr.u") =!= col("pr.w"))
      .select(least(col("pr.u"), col("pr.w")).as("a"),
        greatest(col("pr.u"), col("pr.w")).as("b"))
      .distinct()
      .localCheckpoint(false) // feeds both directions and both rounds
    val und = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b"), col("a")))
    val deg = und.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val s1 = und.join(deg, col("src") === col("node"))
      .groupBy(col("dst").as("n1"))
      .agg((lit(0.15) + lit(0.85) * sum(lit(1.0) / col("d"))).as("s"))
    val s2 = und.join(deg, col("src") === col("node"))
      .join(s1, col("src") === col("n1"))
      .groupBy(col("dst").as("n2"))
      .agg((lit(0.15) + lit(0.85) * sum(col("s") / col("d"))).as("s2"))
    s2.join(deg, col("n2") === col("node"))
      .select(col("n2").as("word"), col("d").cast("long").as("deg"),
        round(col("s2"), 4).as("score"))
      .orderBy(round(col("s2"), 6).desc, col("word"))
      .limit(k)
  }

  /** MTLD lexical diversity (McCarthy & Jarvis 2010, forward pass,
    * factor threshold 0.72) per document — the length-robust
    * type-token ratio (raw TTR falls with length by construction;
    * q220's Heaps law measures that corpus-wide, MTLD is its per-doc
    * counterpart): walk the token stream, count a "factor" each time
    * the running TTR of the current segment drops below 0.72, credit
    * the trailing partial segment (1−ttr)/(1−0.72), and report
    * tokens/factors. The per-doc fold carries (seen types, segment
    * length, factors) through one `aggregate` lambda — doc-bounded
    * state, same shape as q261's seasonal fold; the oracle replays
    * the identical recurrence as a recursive CTE over token
    * positions. The threshold literal and the (1−0.72) denominator
    * are written identically in both engines so every branch and
    * division folds the same doubles.
    */
  val q277Mtld = GraftQuery(
    "q277_mtld",
    "MTLD lexical diversity per document (forward pass, threshold 0.72)",
    Some("""WITH RECURSIVE d AS (
        SELECT doc_id, list_filter(
            regexp_split_to_array(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS t
        FROM documents),
      base AS (SELECT doc_id, t, len(t) AS ntok FROM d),
      rec AS (
        SELECT doc_id, ntok, t, 0 AS i,
          CAST([] AS VARCHAR[]) AS seen, 0 AS tokf, 0.0 AS factors
        FROM base
        UNION ALL
        SELECT doc_id, ntok, t, i + 1,
          CASE WHEN CAST(len(CASE WHEN list_contains(seen, t[i + 1])
              THEN seen ELSE list_append(seen, t[i + 1]) END) AS DOUBLE)
              / (tokf + 1) < 0.72
            THEN CAST([] AS VARCHAR[])
            ELSE CASE WHEN list_contains(seen, t[i + 1])
              THEN seen ELSE list_append(seen, t[i + 1]) END END,
          CASE WHEN CAST(len(CASE WHEN list_contains(seen, t[i + 1])
              THEN seen ELSE list_append(seen, t[i + 1]) END) AS DOUBLE)
              / (tokf + 1) < 0.72
            THEN 0 ELSE tokf + 1 END,
          CASE WHEN CAST(len(CASE WHEN list_contains(seen, t[i + 1])
              THEN seen ELSE list_append(seen, t[i + 1]) END) AS DOUBLE)
              / (tokf + 1) < 0.72
            THEN factors + 1 ELSE factors END
        FROM rec WHERE i < ntok),
      fin AS (
        SELECT doc_id, ntok,
          factors + CASE WHEN tokf > 0
            THEN (1 - CAST(len(seen) AS DOUBLE) / tokf) / (1 - 0.72)
            ELSE 0 END AS ft
        FROM rec WHERE i = ntok)
      SELECT doc_id, CAST(ntok AS BIGINT) AS n_toks,
        ROUND(ft, 4) AS factors,
        ROUND(ntok / NULLIF(ft, 0), 4) AS mtld
      FROM fin ORDER BY doc_id"""),
    (s, d) => mtld(documents(s, d)))

  /** The q277 pipeline — MtldSpec replays the fold in plain Scala
    * and pins the repetition limits (all-same tokens → factors pile
    * up; all-distinct → one partial factor of 0). */
  def mtld(docs: DataFrame): DataFrame = {
    val seen2 = "if(array_contains(acc.seen, t), acc.seen, " +
      "array_append(acc.seen, t))"
    val ttr = s"cast(size($seen2) as double) / (acc.tokf + 1)"
    // final sort FIRST, fold after: a global sort's range-partition
    // sampling pass executes its whole narrow child once more, so a
    // sort placed above the fold runs the per-token aggregate lambda
    // (interpreted, the expensive leg) TWICE per row (round-12 probe:
    // q24's identical shape measured 2× its projection cost). Sorting
    // the (doc_id, toks) frame and folding above it keeps the sample
    // pass to tokenize-only and the output order is untouched — a
    // Project preserves its child's ordering.
    docs.select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"),
          w => length(w) > 0).as("toks"))
      .orderBy(col("doc_id"))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("ft", expr(
        s"""aggregate(toks,
             named_struct('seen', cast(array() as array<string>),
               'tokf', 0, 'factors', cast(0.0 as double)),
             (acc, t) -> if($ttr < 0.72,
               named_struct('seen', cast(array() as array<string>),
                 'tokf', 0, 'factors', acc.factors + 1),
               named_struct('seen', $seen2, 'tokf', acc.tokf + 1,
                 'factors', acc.factors)),
             acc -> acc.factors + if(acc.tokf > 0,
               (1 - cast(size(acc.seen) as double) / acc.tokf)
                 / (1 - 0.72), cast(0.0 as double)))"""))
      .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
        round(col("ft"), 4).as("factors"),
        round(col("n_toks") / nullif(col("ft"), lit(0.0)), 4).as("mtld"))
  }
}
