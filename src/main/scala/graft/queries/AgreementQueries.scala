package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Tables._
import graft.text.{TextAnalysis => TA}

/** Inter-annotator agreement over the label-quality family — chance-
  * corrected agreement between three deterministic quality raters
  * (token-count, stopword-ratio, and character-length terciles, each a
  * real curation signal from q23's metric set). Labeling pipelines
  * gate on these statistics before trusting a rater pool; the
  * reference never measures agreement anywhere (its labels arrive
  * unquestioned, book.md:8-21) — an engine curating training data
  * must. Three classics, one shared rater table:
  * Cohen's κ (pairwise), Fleiss' κ (pool-level, per source), and
  * Krippendorff's nominal α (coincidence-matrix form).
  *
  * Scale design: everything reduces over the (doc, rater, category)
  * table — 3 rows per document, one equi-join on doc_id for the
  * pairwise/coincidence forms (≤9 output rows per doc), then
  * |raters|²·|cats|²-bounded arithmetic on broadcast marginal tables.
  * No windows, no non-equi joins; the corpus crosses two shuffles
  * (rater table group-bys). Category cut points are fixed engine
  * constants (not corpus quantiles), so the rater is a pure per-row
  * map at any scale; the threshold values sit strictly between the
  * representable ratio values the corpus can produce (denominators
  * ≤ max token count), so no row can land on a cut in either engine.
  */
object AgreementQueries {

  def queries: Seq[GraftQuery] =
    Seq(q251CohensKappa, q252FleissKappa, q253Krippendorff)

  private val stopList = TA.Stopwords.map(w => s"'$w'").mkString(", ")

  /** The three raters as a long (doc_id, source, rater, cat) table;
    * cat ∈ {0,1,2}. Cut points: tokens 40/70, stopword ratio
    * 0.046/0.0715, chars 200/380. */
  private[queries] def raters(docs: DataFrame): DataFrame = {
    def tercile(v: Column, lo: Column, hi: Column): Column =
      when(v < lo, 0).when(v < hi, 1).otherwise(2)
    docs.select(col("doc_id"), col("source"),
      tercile(TA.tokenCount(col("text")), lit(40), lit(70)).as("cat_tok"),
      tercile(TA.stopwordRatio(col("text")), lit(0.046), lit(0.0715))
        .as("cat_stop"),
      tercile(col("n_chars"), lit(200), lit(380)).as("cat_len"))
      .select(col("doc_id"), col("source"), expr(
        """stack(3, 'len', cat_len, 'stop', cat_stop, 'tok', cat_tok)
           AS (rater, cat)"""))
  }

  /** The same rater table as oracle SQL (CTE named `rt`). */
  private val ratersSql = s"""rt AS (
        SELECT doc_id, source, r.rater, r.cat
        FROM (
          SELECT doc_id, source,
            CASE WHEN ntok < 40 THEN 0
              WHEN ntok < 70 THEN 1 ELSE 2 END AS cat_tok,
            CASE WHEN nstop * 1.0 / ntok < 0.046 THEN 0
              WHEN nstop * 1.0 / ntok < 0.0715 THEN 1 ELSE 2 END AS cat_stop,
            CASE WHEN n_chars < 200 THEN 0
              WHEN n_chars < 380 THEN 1 ELSE 2 END AS cat_len
          FROM (
            SELECT doc_id, source, n_chars,
              len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS ntok,
              len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                t -> t IN ($stopList))) AS nstop
            FROM documents)),
          LATERAL (VALUES ('len', cat_len), ('stop', cat_stop),
            ('tok', cat_tok)) AS r(rater, cat))"""

  /** Pairwise Cohen's κ for the three rater pairs: observed agreement
    * po over the doc-equi-joined pair table, chance agreement
    * pe = Σ_c pA(c)·pB(c) from the broadcast marginal table,
    * κ = (po − pe)/(1 − pe). */
  val q251CohensKappa = GraftQuery(
    "q251_cohens_kappa",
    "pairwise Cohen's kappa between the three tercile quality raters",
    Some(s"""WITH $ratersSql,
      n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM rt),
      pairs AS (
        SELECT a.rater AS ra, b.rater AS rb,
          AVG(CASE WHEN a.cat = b.cat THEN 1.0 ELSE 0.0 END) AS po
        FROM rt a JOIN rt b ON a.doc_id = b.doc_id AND a.rater < b.rater
        GROUP BY 1, 2),
      marg AS (
        SELECT rater, cat, COUNT(*) * 1.0 / MIN(nd) AS p
        FROM rt, n GROUP BY 1, 2),
      pe AS (
        SELECT ma.rater AS ra, mb.rater AS rb, SUM(ma.p * mb.p) AS pe
        FROM marg ma JOIN marg mb
          ON ma.cat = mb.cat AND ma.rater < mb.rater
        GROUP BY 1, 2)
      SELECT pairs.ra || '-' || pairs.rb AS pair,
        CAST(ROUND(CAST(CAST(po AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS po,
        CAST(ROUND(CAST(CAST(pe.pe AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS pe,
        CAST(ROUND(CAST(CAST((po - pe.pe) / (1 - pe.pe) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS kappa
      FROM pairs JOIN pe ON pairs.ra = pe.ra AND pairs.rb = pe.rb
      ORDER BY 1"""),
    (s, d) => cohensKappa(raters(documents(s, d))))

  /** The q251 pipeline over any (doc_id, rater, cat) frame —
    * AgreementSpec hand-traces a 2-rater confusion table and pins the
    * perfect-agreement (κ=1) and independent-raters (κ≈0) limits. */
  def cohensKappa(rt: DataFrame): DataFrame = {
    val r = rt.localCheckpoint(false) // feeds pairs AND marginals
    val nd = r.select(countDistinct(col("doc_id")).as("nd"))
    val pairs = r.as("a").join(r.as("b"),
      col("a.doc_id") === col("b.doc_id") && col("a.rater") < col("b.rater"))
      .groupBy(col("a.rater").as("ra"), col("b.rater").as("rb"))
      .agg(avg(when(col("a.cat") === col("b.cat"), 1.0).otherwise(0.0))
        .as("po"))
    val marg = r.groupBy(col("rater"), col("cat"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nd))
      .select(col("rater"), col("cat"),
        (col("cnt") * lit(1.0) / col("nd")).as("p"))
    val pe = marg.as("ma").join(marg.as("mb"),
      col("ma.cat") === col("mb.cat") && col("ma.rater") < col("mb.rater"))
      .groupBy(col("ma.rater").as("ra"), col("mb.rater").as("rb"))
      .agg(sum(col("ma.p") * col("mb.p")).as("pe"))
    pairs.join(pe, Seq("ra", "rb"))
      .select(concat(col("ra"), lit("-"), col("rb")).as("pair"),
        round(col("po"), 4).as("po"), round(col("pe"), 4).as("pe"),
        round((col("po") - col("pe")) / (lit(1) - col("pe")), 4)
          .as("kappa"))
      .orderBy(col("pair"))
  }

  /** Fleiss' κ per source over the 3-rater pool: per-doc agreement
    * P_i = (Σ_c n_ic² − m)/(m(m−1)) with m = 3 raters, pooled
    * P̄ vs chance P̄e = Σ_c p_c². */
  val q252FleissKappa = GraftQuery(
    "q252_fleiss_kappa",
    "Fleiss' kappa of the three-rater quality pool, per source",
    Some(s"""WITH $ratersSql,
      cellc AS (
        SELECT source, doc_id, cat, COUNT(*) AS nic
        FROM rt GROUP BY 1, 2, 3),
      perdoc AS (
        SELECT source, doc_id,
          (SUM(nic * nic) - 3.0) / 6.0 AS p_i
        FROM cellc GROUP BY 1, 2),
      pbar AS (
        SELECT source, COUNT(*) AS n_docs, AVG(p_i) AS p_bar
        FROM perdoc GROUP BY 1),
      pc AS (
        SELECT source, cat, SUM(nic) AS n_c FROM cellc GROUP BY 1, 2),
      pec AS (
        SELECT pc.source,
          SUM(POW(n_c * 1.0 / (pbar.n_docs * 3.0), 2)) AS p_e
        FROM pc JOIN pbar ON pc.source = pbar.source
        GROUP BY 1)
      SELECT pbar.source, CAST(pbar.n_docs AS BIGINT) AS n_docs,
        CAST(ROUND(CAST(CAST(p_bar AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS p_bar,
        CAST(ROUND(CAST(CAST(p_e AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS p_e,
        CAST(ROUND(CAST(CAST((p_bar - p_e) / (1 - p_e) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS kappa
      FROM pbar JOIN pec ON pbar.source = pec.source ORDER BY 1"""),
    (s, d) => fleissKappa(raters(documents(s, d))))

  /** The q252 pipeline — AgreementSpec pins unanimity (κ=1) and a
    * hand-traced mixed pool. */
  def fleissKappa(rt: DataFrame): DataFrame = {
    val cellc = rt.groupBy(col("source"), col("doc_id"), col("cat"))
      .agg(count(lit(1)).as("nic"))
      .localCheckpoint(false) // feeds per-doc P_i AND category totals
    val pbar = cellc.groupBy(col("source"), col("doc_id"))
      .agg(((sum(col("nic") * col("nic")) - 3.0) / 6.0).as("p_i"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), avg(col("p_i")).as("p_bar"))
    val pec = cellc.groupBy(col("source"), col("cat"))
      .agg(sum(col("nic")).as("n_c"))
      .join(broadcast(pbar.select(col("source"), col("n_docs"))),
        Seq("source"))
      .groupBy(col("source"))
      .agg(sum(pow(col("n_c") * lit(1.0) / (col("n_docs") * lit(3.0)),
        2)).as("p_e"))
    pbar.join(pec, Seq("source"))
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        round(col("p_bar"), 4).as("p_bar"), round(col("p_e"), 4).as("p_e"),
        round((col("p_bar") - col("p_e")) / (lit(1) - col("p_e")), 4)
          .as("kappa"))
      .orderBy(col("source"))
  }

  /** Krippendorff's nominal α over the whole corpus: coincidence
    * matrix o_ck = Σ_u n_uc·(n_uk − δ_ck)/(m−1), disagreement
    * Do = Σ_{c≠k} o_ck / n vs expected De = Σ_{c≠k} n_c·n_k/(n(n−1)),
    * α = 1 − Do/De. One row — the corpus-level go/no-go number a
    * labeling run gates on. */
  val q253Krippendorff = GraftQuery(
    "q253_krippendorff",
    "Krippendorff's nominal alpha of the three-rater pool (coincidence form)",
    Some(s"""WITH $ratersSql,
      cellc AS (SELECT doc_id, cat, COUNT(*) AS nic
        FROM rt GROUP BY 1, 2),
      o AS (
        SELECT a.cat AS c, b.cat AS k,
          SUM(a.nic * (b.nic - CASE WHEN a.cat = b.cat THEN 1 ELSE 0 END)
            / 2.0) AS ock
        FROM cellc a JOIN cellc b ON a.doc_id = b.doc_id
        GROUP BY 1, 2),
      nc AS (SELECT c, SUM(ock) AS n_c FROM o GROUP BY 1),
      tot AS (SELECT SUM(n_c) AS n FROM nc),
      dd AS (SELECT SUM(CASE WHEN c != k THEN ock ELSE 0 END) AS dsum
        FROM o),
      de AS (
        SELECT SUM(a.n_c * b.n_c) AS esum
        FROM nc a JOIN nc b ON a.c != b.c)
      SELECT CAST((SELECT COUNT(DISTINCT doc_id) FROM rt) AS BIGINT)
          AS n_units,
        CAST(ROUND(CAST(CAST(dsum / n AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS d_o,
        CAST(ROUND(CAST(CAST(esum / (n * (n - 1)) AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS d_e,
        CAST(ROUND(CAST(CAST(1 - (dsum / n) / (esum / (n * (n - 1)))
          AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS alpha
      FROM dd, de, tot"""),
    (s, d) => krippendorff(raters(documents(s, d))))

  /** The q253 pipeline — AgreementSpec pins α=1 under unanimity and
    * the textbook worked example. */
  def krippendorff(rt: DataFrame): DataFrame = {
    val cellc = rt.groupBy(col("doc_id"), col("cat"))
      .agg(count(lit(1)).as("nic"))
      .localCheckpoint(false) // self-joined for the coincidence matrix
    val o = cellc.as("a").join(cellc.as("b"),
      col("a.doc_id") === col("b.doc_id"))
      .groupBy(col("a.cat").as("c"), col("b.cat").as("k"))
      .agg(sum(col("a.nic")
        * (col("b.nic") - when(col("a.cat") === col("b.cat"), 1)
          .otherwise(0)) / 2.0).as("ock"))
      .localCheckpoint(false) // feeds nc, the diagonal sum, and n
    val nc = o.groupBy(col("c")).agg(sum(col("ock")).as("n_c"))
    val n = nc.select(sum(col("n_c")).as("n"))
    val dsum = o.select(
      sum(when(col("c") =!= col("k"), col("ock")).otherwise(0.0))
        .as("dsum"))
    val esum = nc.as("a")
      .join(broadcast(nc.as("b")), col("a.c") =!= col("b.c"))
      .select(sum(col("a.n_c") * col("b.n_c")).as("esum"))
    val units = rt.select(countDistinct(col("doc_id")).as("n_units"))
    units.crossJoin(broadcast(dsum)).crossJoin(broadcast(esum))
      .crossJoin(broadcast(n))
      .select(col("n_units").cast("long").as("n_units"),
        round(col("dsum") / col("n"), 4).as("d_o"),
        round(col("esum") / (col("n") * (col("n") - 1)), 4).as("d_e"),
        round(lit(1) - (col("dsum") / col("n"))
          / (col("esum") / (col("n") * (col("n") - 1))), 4).as("alpha"))
  }
}
