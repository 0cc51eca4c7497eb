package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction over a text column — the scrub step every
  * public training-data pipeline runs before release (the reference's
  * corpus prep stops at field projection, music.md:138-162; a corpus
  * engine at 100 TB needs the scrub as a first-class operator). Three
  * structured-PII families as codegen'd regexp columns (no UDFs):
  * emails, NANP-style phone fragments, dotted-quad IPs. Patterns stay
  * inside the RE2-compatible subset (no backrefs/lookaround) so the
  * DuckDB oracle replays them verbatim — Java's regex engine and RE2
  * agree on this subset by construction.
  *
  * Scale shape: per-row scalar expressions in the scan stage —
  * embarrassingly parallel, no shuffle, whole-stage codegen keeps the
  * regex evaluation inside the generated loop. At 100 TB this is a
  * map-only pass fused with whatever scan feeds it.
  */
object Pii {

  /** (name, pattern) in evaluation order; redaction applies them in
    * this order, so earlier families absorb overlapping spans (an
    * email's host dots are gone before the IP pass runs). */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
    "phone" -> "\\b555-[0-9]{4}\\b",
    "ip" -> "\\b10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  /** Count of matches of one PII family in `text`. */
  def piiCount(text: Column, family: String): Column =
    regexp_count(text, lit(pattern(family)))

  /** `text` with every PII family replaced by its [FAMILY] tag. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (t, (name, pat)) =>
      regexp_replace(t, pat, s"[${name.toUpperCase}]")
    }

  def pattern(family: String): String =
    patterns.collectFirst { case (n, p) if n == family => p }
      .getOrElse(sys.error(s"unknown PII family $family"))
}
