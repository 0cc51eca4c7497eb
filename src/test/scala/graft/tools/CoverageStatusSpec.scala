package graft.tools

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog

/** Staleness gate for COVERAGE.md's hand-written oracle-status cells
  * (round-8 verdict #2: three dedup queries graduated to value-exact
  * but the §7.6 summary table still said "rows-only" — and a fourth
  * cell, winnowing, had the same drift unnoticed). CATALOG.md is
  * generated so it can't lie; COVERAGE.md is narrative so it can.
  * This spec extracts every TIGHT status claim — a query token within
  * a few punctuation characters of "rows-only" or "value-exact" —
  * and requires it to agree with `Catalog.all` (rows-only ⇔ no oracle
  * SQL). Loose narrative ("entered rows-only", "…→ VALUE-EXACT"
  * graduation notes) is deliberately outside the net: prose history
  * isn't a status cell. No query is named here on purpose: CatalogIndex
  * would otherwise list this spec in every named query's pin column.
  */
class CoverageStatusSpec extends AnyFunSuite {

  private val claim = """(q\d+[a-z_0-9]*)[^a-zA-Z0-9\n]{0,12}(rows-only|value-exact)""".r

  test("COVERAGE.md status claims agree with Catalog.all oracle presence") {
    val repo = Paths.get(sys.props.getOrElse("graft.repo", "/root/repo"))
    val text =
      new String(Files.readAllBytes(repo.resolve("COVERAGE.md")), "UTF-8")
    val byName = Catalog.all.map(q => q.name -> q.oracle.isDefined).toMap
    val stale = claim.findAllMatchIn(text).flatMap { m =>
      // a graduation note ("rows-only → VALUE-EXACT", possibly with a
      // parenthetical in between) is history, not a status cell —
      // skip claims followed by an arrow within the same clause
      val after = text.substring(m.end, math.min(text.length, m.end + 32))
        .takeWhile(c => c != '\n')
      if (after.contains("→") || after.contains("->")) None
      else {
        val token = m.group(1)
        val claimed = m.group(2)
        // a bare number resolves by prefix to the full catalog name;
        // full names resolve exactly
        val resolved = byName.keys.filter(n =>
          n == token || n.startsWith(token + "_")).toSeq
        resolved match {
          case Seq(name) =>
            val actual = if (byName(name)) "value-exact" else "rows-only"
            if (actual != claimed) Some(s"$token claimed $claimed, catalog says $actual")
            else None
          case Seq() => None // narrative token that isn't a catalog query
          case many => Some(s"$token is ambiguous: ${many.sorted.mkString(", ")}")
        }
      }
    }.toSeq
    assert(stale.isEmpty,
      s"\nstale COVERAGE.md status cells:\n  ${stale.mkString("\n  ")}\n" +
        "Update the cells to match CATALOG.md / Catalog.all.")
  }

  test("the gate's claim net actually catches the §7.6 status cells") {
    // If an edit rewords the tables so no tight claims parse at all,
    // the first test would pass vacuously; pin a floor instead.
    val repo = Paths.get(sys.props.getOrElse("graft.repo", "/root/repo"))
    val text =
      new String(Files.readAllBytes(repo.resolve("COVERAGE.md")), "UTF-8")
    val n = claim.findAllMatchIn(text).size
    assert(n >= 10, s"only $n tight status claims parsed from COVERAGE.md — " +
      "the staleness net lost its catch; fix the regex or the tables")
  }
}
