package graft.queries

import org.apache.spark.sql.functions._

import graft.model.Tables._
import graft.text.Resolution

/** Fuzzy entity-resolution wave (graft.text.Resolution): the blocking /
  * Jaro–Winkler-verify / argmax record-linkage pipeline and its own
  * evaluation harness, over a planted single-character corruption of
  * unique part entity strings. The corruption is a pure function of the
  * row (delete char at 1 + id % len), so the DuckDB oracle replays the
  * whole pipeline value-exactly — including the native
  * [[graft.functions.JaroWinkler]] expression, which was pinned
  * case-by-case against DuckDB's `jaro_winkler_similarity`
  * (FunctionsSpec probe table).
  *
  * Reference anchor: book.md:8-21's "core slice" densification dodges
  * the all-pairs match; this wave does the match without the dodge —
  * deletion-index blocking keeps candidates collision-bounded instead
  * of n² (the Resolution scaladoc records the measured failure of the
  * obvious token-blocking scheme that this design replaced), the
  * verify is a codegen'd expression, and the classification window is
  * per-record. q216 measures the two numbers any linkage deployment
  * reports: pairs-completeness of the blocking (did the cheap keys
  * keep the true match in the candidate set?) and reduction ratio
  * (what fraction of the n² comparisons the blocking avoided).
  */
object ResolutionQueries {

  def queries: Seq[GraftQuery] = Seq(q215FuzzyMatch, q216LinkageEval,
    q237DlRescore)

  /** Shared oracle CTE chain: entities, planted dirty variants,
    * deletion-index blocking (Resolution scaladoc: last token ∪ its
    * deletions ∪ merged-last-two on the clean side, last token on the
    * dirty side), JW-scored candidates, per-record argmax. */
  private val linkageCtes = """ent AS (
        SELECT p_partkey AS cid,
          p_name || ' #' || CAST(p_partkey AS VARCHAR) AS cname FROM part),
      dirty AS (
        SELECT cid + 10000000 AS did, cid AS src,
          substr(cname, 1, pos - 1) || substr(cname, pos + 1) AS dname
        FROM (SELECT cid, cname, 1 + (cid % length(cname)) AS pos
          FROM ent WHERE cid % 3 = 0)),
      ck AS (
        SELECT cid, cname,
          unnest(list_distinct([l, coalesce(m, l)] || dels)) AS k
        FROM (SELECT cid, cname, l,
            CASE WHEN len(toks) >= 2 THEN toks[-2] || l END AS m,
            list_transform(range(1, length(l) + 1),
              p -> substr(l, 1, p - 1) || substr(l, p + 1)) AS dels
          FROM (SELECT cid, cname, string_split(cname, ' ') AS toks,
              string_split(cname, ' ')[-1] AS l FROM ent))),
      dk AS (SELECT did, src, dname, string_split(dname, ' ')[-1] AS k
        FROM dirty),
      cand AS (SELECT DISTINCT dk.did, dk.src, dk.dname, ck.cid, ck.cname
        FROM dk JOIN ck USING (k)),
      scored AS (
        SELECT did, src, cid,
          ROUND(jaro_winkler_similarity(dname, cname), 9) AS jw9,
          ROW_NUMBER() OVER (PARTITION BY did
            ORDER BY ROUND(jaro_winkler_similarity(dname, cname), 9) DESC,
              cid) AS rn
        FROM cand)"""

  /** Unique entity strings (64 distinct p_names × the key suffix makes
    * every row a distinct entity, so precision-vs-source is a real
    * metric) and their planted dirty variants. */
  private def entities(s: org.apache.spark.sql.SparkSession, d: String) = {
    val ent = part(s, d).select(col("p_partkey").as("cid"),
      concat(col("p_name"), lit(" #"),
        col("p_partkey").cast("string")).as("cname"))
    val dirty = ent.where(col("cid") % 3 === 0)
      .select((col("cid") + 10000000L).as("did"), col("cid").as("src"),
        Resolution.deleteOneChar(col("cname"), col("cid")).as("dname"))
    (ent, dirty)
  }

  /** Per-dirty-record best match: deletion-index blocking join,
    * codegen'd JW verify, argmax with the portable (jw9 desc, cid asc)
    * tie-break. One shuffle on the block key, one on did for the
    * per-record window; the 642/667 hit rate at sf0.01 is genuine —
    * a deleted digit can make the corrupted key IDENTICAL to another
    * entity's id token, and JW then has to decide on the name part.
    */
  val q215FuzzyMatch = GraftQuery(
    "q215_fuzzy_match",
    "blocked Jaro-Winkler entity match of planted dirty part entities",
    Some(s"""WITH $linkageCtes
      SELECT CAST(did AS BIGINT) AS did, CAST(cid AS BIGINT) AS matched,
        ROUND(jw9, 6) AS jw,
        CASE WHEN cid = src THEN 1 ELSE 0 END AS hit
      FROM scored WHERE rn = 1 ORDER BY did"""),
    (s, d) => {
      val (ent, dirty) = entities(s, d)
      Resolution.best(Resolution.scored(Resolution.candidates(ent, dirty)))
        .select(col("did").cast("long").as("did"),
          col("cid").cast("long").as("matched"),
          round(col("jw9"), 6).as("jw"),
          when(col("cid") === col("src"), 1).otherwise(0).as("hit"))
        .orderBy(col("did"))
    })

  /** Record-linkage evaluation, one row: corpus sizes, candidate
    * volume, pairs-completeness of the blocking (1.0 by construction
    * against single-edit corruption — the spec proves why, this query
    * measures it), reduction ratio vs the n² all-pairs baseline, and
    * precision@1 of the argmax. The whole thing is three bounded
    * aggregates over the shared candidate stream — the eval costs no
    * more than the match.
    */
  val q216LinkageEval = GraftQuery(
    "q216_linkage_eval",
    "blocking pairs-completeness, reduction ratio, precision@1 of q215",
    Some(s"""WITH $linkageCtes,
      best AS (SELECT did, src, cid, jw9 FROM scored WHERE rn = 1),
      sizes AS (SELECT (SELECT COUNT(*) FROM dirty) AS n_dirty,
        (SELECT COUNT(*) FROM ent) AS n_clean),
      cs AS (SELECT COUNT(*) AS n_cand,
        COUNT(DISTINCT CASE WHEN cid = src THEN did END) AS n_covered
        FROM cand),
      bs AS (SELECT SUM(CASE WHEN cid = src THEN 1 ELSE 0 END) AS n_hit,
        AVG(CASE WHEN cid = src THEN jw9 END) AS hit_jw FROM best)
      SELECT CAST(n_dirty AS BIGINT) AS n_dirty,
        CAST(n_clean AS BIGINT) AS n_clean,
        CAST(n_cand AS BIGINT) AS n_cand,
        CAST(ROUND(CAST(CAST(n_covered * 1.0 / n_dirty AS VARCHAR)
          AS DECIMAL(38,18)), 6) AS DOUBLE) AS pairs_completeness,
        CAST(ROUND(CAST(CAST(1 - n_cand * 1.0 / (n_dirty * n_clean) AS VARCHAR)
          AS DECIMAL(38,18)), 6) AS DOUBLE) AS reduction_ratio,
        CAST(ROUND(CAST(CAST(n_hit * 1.0 / n_dirty AS VARCHAR)
          AS DECIMAL(38,18)), 6) AS DOUBLE) AS precision_at_1,
        ROUND(hit_jw, 6) AS mean_hit_jw
      FROM sizes, cs, bs"""),
    (s, d) => {
      val (ent, dirty) = entities(s, d)
      val cand = Resolution.scored(Resolution.candidates(ent, dirty))
        .localCheckpoint(false) // feeds the candidate stats AND the argmax
      val sizes = dirty.agg(count(lit(1)).as("n_dirty"))
        .crossJoin(broadcast(ent.agg(count(lit(1)).as("n_clean"))))
      val cs = cand.agg(count(lit(1)).as("n_cand"),
        countDistinct(when(col("cid") === col("src"), col("did")))
          .as("n_covered"))
      val bs = Resolution.best(cand)
        .agg(sum(when(col("cid") === col("src"), 1).otherwise(0)).as("n_hit"),
          avg(when(col("cid") === col("src"), col("jw9"))).as("hit_jw"))
      sizes.crossJoin(broadcast(cs)).crossJoin(broadcast(bs))
        .select(col("n_dirty").cast("long"), col("n_clean").cast("long"),
          col("n_cand").cast("long"),
          round(col("n_covered") / col("n_dirty"), 6)
            .as("pairs_completeness"),
          round(lit(1) - col("n_cand") / (col("n_dirty") * col("n_clean")), 6)
            .as("reduction_ratio"),
          round(col("n_hit") / col("n_dirty"), 6).as("precision_at_1"),
          round(col("hit_jw"), 6).as("mean_hit_jw"))
    })

  /** Transposition-aware rescoring of the SAME candidate stream with
    * the native [[graft.functions.DamerauLevenshtein]] expression
    * (full DL, probed against DuckDB case-by-case and on 6 000 random
    * pairs — FunctionsSpec) — the second opinion every linkage
    * deployment wants: JW is a positional similarity tuned for
    * prefix-heavy names, DL counts EDITS, so the two argbests disagree
    * exactly where the corruption stops looking like a typo. Per
    * dirty record: DL's pick (argmin distance, ties to the smallest
    * clean id), its distance, whether DL found the true source, and
    * whether the two scorers agree. Same shuffles as q215 (the
    * candidates come from the one blocking join, checkpointed); the
    * two rank windows are per-record fan-in only.
    */
  val q237DlRescore = GraftQuery(
    "q237_dl_rescore",
    "Damerau-Levenshtein second-opinion rescore of the q215 candidates",
    Some(s"""WITH $linkageCtes,
      dscored AS (
        SELECT did, src, cid,
          damerau_levenshtein(dname, cname) AS dl,
          ROW_NUMBER() OVER (PARTITION BY did
            ORDER BY damerau_levenshtein(dname, cname), cid) AS drn
        FROM cand),
      jbest AS (SELECT did, cid AS jcid FROM scored WHERE rn = 1),
      dbest AS (SELECT did, src, cid, dl FROM dscored WHERE drn = 1)
      SELECT CAST(d.did AS BIGINT) AS did,
        CAST(d.cid AS BIGINT) AS matched_dl, CAST(d.dl AS INTEGER) AS dl,
        CASE WHEN d.cid = d.src THEN 1 ELSE 0 END AS hit_dl,
        CASE WHEN d.cid = j.jcid THEN 1 ELSE 0 END AS agree_jw
      FROM dbest d JOIN jbest j USING (did) ORDER BY did"""),
    (s, d) => {
      import graft.functions.DamerauLevenshtein.damerau_levenshtein
      val (ent, dirty) = entities(s, d)
      val cand = Resolution.candidates(ent, dirty)
        .localCheckpoint(false) // feeds both scorers
      val dw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("did")).orderBy(col("dl"), col("cid"))
      val dbest = cand
        .withColumn("dl", damerau_levenshtein(col("dname"), col("cname")))
        .withColumn("drn", row_number().over(dw))
        .where(col("drn") === 1)
      val jbest = Resolution.best(Resolution.scored(cand))
        .select(col("did"), col("cid").as("jcid"))
      dbest.join(jbest, Seq("did"))
        .select(col("did").cast("long").as("did"),
          col("cid").cast("long").as("matched_dl"),
          col("dl").cast("int").as("dl"),
          when(col("cid") === col("src"), 1).otherwise(0).as("hit_dl"),
          when(col("cid") === col("jcid"), 1).otherwise(0).as("agree_jw"))
        .orderBy(col("did"))
    })
}
