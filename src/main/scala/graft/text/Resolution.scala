package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler.jaro_winkler

/** Fuzzy entity resolution: deletion-indexed blocking + Jaro–Winkler
  * verify + per-record argmax — the record-linkage pipeline (blocking /
  * comparison / classification) a training-data curation stack runs to
  * canonicalize near-identical entity strings (vendor names, author
  * strings, product titles) before joining corpora.
  *
  * Reference anchor: the book pipeline's "densify then match" dodge
  * (book.md:8-21) sidesteps exactly this problem by restricting to a
  * core slice; the engine's claim is doing the match WITHOUT the dodge.
  *
  * **Blocking design — measured, falsified, fixed.** The obvious
  * scheme (block on {first, last} token) was built first and fell into
  * the skew trap its own design note predicted: entity vocabularies
  * are tiny (64 distinct part names → 8 distinct first tokens), so the
  * first-token blocks go quadratic — 108 091 candidates at sf0.01 and
  * 26–48 s at sf0.1, 10× the informal per-query bar. The shipped
  * scheme is symmetric-deletion indexing (the SymSpell spell-correction
  * idea, public domain) anchored on the record's LAST token — the
  * discriminating one:
  *
  *  - clean side indexes: the last token, each of its single-character
  *    deletions, and the merge of the last two tokens;
  *  - dirty side emits ONE key: its last token.
  *
  * Against single-character deletion this has recall 1 by case
  * analysis: a deletion outside the last token leaves it intact
  * (key = last token); deleting the space before the last token
  * produces exactly the clean side's merged key; a deletion inside the
  * last token produces one of its indexed deletion variants. Block
  * sizes are bounded by key-collision structure (which ids are one
  * digit-insertion apart), NOT by vocabulary frequency — measured
  * 5 895 candidates at sf0.01 / 81 052 at sf0.1 (18× fewer than token
  * blocking at sf0.01), flat per-record.
  *
  * **Verify** is the [[graft.functions.JaroWinkler]] native expression
  * — codegen'd, so the candidate-pair stream never leaves whole-stage
  * codegen (no UDF boxing at 100 TB). **Classification** is argmax per
  * dirty record over a did-partitioned window — per-record fan-in,
  * never global; scores rank on a 9-decimal rounding so the tie-break
  * (score desc, cid asc) is engine-portable.
  */
object Resolution {

  /** All single-character deletions of a string, as an array column.
    * The lambda runs once per record on the key-generation scan, not
    * on the candidate-pair hot path. */
  def deletionVariants(c: Column): Column =
    transform(sequence(lit(1), length(c)), p =>
      concat(c.substr(lit(1), p - 1), c.substr(p + 1, length(c))))

  /** Clean-side index keys: last token ∪ its deletions ∪ the merged
    * last-two-tokens (the space-deletion case), deduped. */
  def cleanKeys(c: Column): Column = {
    val toks = split(c, " ")
    val last = element_at(toks, -1)
    val merged = when(size(toks) >= 2,
      concat(element_at(toks, -2), last))
    array_distinct(concat(
      array(last, coalesce(merged, last)), deletionVariants(last)))
  }

  /** Dirty-side key: just the last token. */
  def dirtyKey(c: Column): Column = element_at(split(c, " "), -1)

  /** Deterministic single-character deletion at 1-indexed position
    * `1 + id % length(name)` — the planted corruption every eval
    * derives from (same convention as the md5-derived corruptions of
    * the dedup family: the "noise" must be a pure function of the row
    * so the DuckDB oracle replays it).
    */
  def deleteOneChar(name: Column, id: Column): Column = {
    val pos = lit(1) + id % length(name)
    concat(name.substr(lit(1), pos - 1),
      name.substr(pos + 1, length(name)))
  }

  /** Candidate pairs via the deletion-index blocking, deduped.
    * Input frames: clean (cid, cname), dirty (did, src, dname).
    * One shuffle on the block key. */
  def candidates(clean: DataFrame, dirty: DataFrame): DataFrame = {
    val ck = clean.select(col("cid"), col("cname"),
      explode(cleanKeys(col("cname"))).as("k"))
    val dk = dirty.select(col("did"), col("src"), col("dname"),
      dirtyKey(col("dname")).as("k"))
    dk.join(ck, Seq("k"))
      .select(col("did"), col("src"), col("dname"), col("cid"), col("cname"))
      .distinct()
  }

  /** Jaro–Winkler-scored candidates with the portable 9-decimal
    * ranking score attached. */
  def scored(cand: DataFrame): DataFrame =
    cand.withColumn("jw9", round(jaro_winkler(col("dname"), col("cname")), 9))

  /** Best match per dirty record: argmax jw9, ties to the smallest
    * clean id. The window is did-partitioned — per-record fan-in only. */
  def best(sc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("did"))
      .orderBy(col("jw9").desc, col("cid"))
    sc.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }
}
