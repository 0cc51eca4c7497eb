package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Resolution (blocking + Jaro–Winkler verify + argmax) on hand-built
  * corpora — the properties q215/q216's fixture run can't isolate.
  */
class ResolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clean(rows: (Int, String)*) =
    rows.toDF("cid", "cname")
  private def dirty(rows: (Long, Int, String)*) =
    rows.toDF("did", "src", "dname")

  test("deleteOneChar deletes exactly the id-derived position") {
    val got = Seq((0, "abcdef"), (1, "abcdef"), (5, "abcdef"), (6, "abcdef"))
      .toDF("id", "s")
      .select($"id", Resolution.deleteOneChar($"s", $"id").as("d"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(0) === "bcdef")  // pos 1
    assert(got(1) === "acdef")  // pos 2
    assert(got(5) === "abcde")  // pos 6 (last)
    assert(got(6) === "bcdef")  // 6 % 6 = 0 → pos 1 wraps
  }

  test("single-edit corruption never escapes the deletion-index blocks") {
    // corrupt EVERY position of a 3-token name — the recall-1 case
    // analysis made exhaustive: deletion outside the last token keeps
    // the key, deleting the pre-last space hits the merged key, and a
    // deletion inside the last token hits one of its indexed variants
    val name = "alpha beta gamma"
    val ent = clean(7 -> name)
    val d = (1 to name.length).map { pos =>
      (1000L + pos, 7, name.substring(0, pos - 1) + name.substring(pos))
    }
    val cand = Resolution.candidates(ent, dirty(d: _*))
    val covered = cand.where($"cid" === $"src").select($"did")
      .distinct().count()
    assert(covered === name.length.toLong) // all 16 corruptions blocked in
  }

  test("argmax picks the JW-closest candidate; ties go to the smaller cid") {
    val ent = clean(1 -> "red widget #9", 2 -> "red widget #8",
      3 -> "blue widget #9")
    // dirty = "red widget #" (digit deleted): JW-equidistant from
    // cids 1 and 2 (same length, same prefix), farther from 3
    val d = dirty((100L, 1, "red widget #"))
    val b = Resolution.best(Resolution.scored(Resolution.candidates(ent, d)))
      .select($"did", $"cid", $"jw9").collect()
    assert(b.length === 1)
    assert(b.head.getInt(1) === 1) // tie vs cid 2 resolved to smaller cid
  }

  test("scored JW agrees with the kernel on the exact candidate strings") {
    val ent = clean(1 -> "hot gear #3")
    val d = dirty((10L, 1, "hotgear #3"))
    val got = Resolution.scored(Resolution.candidates(ent, d))
      .select($"jw9").head.getDouble(0)
    assert(got === 0.932121212) // the DuckDB-pinned odd-transposition case
  }

  test("DL rescore: a transposition costs one edit and outranks a longer rewrite") {
    import graft.functions.DamerauLevenshtein.damerau_levenshtein
    // dirty "red widgte #7" (te↔et swap of cid 1's name): DL 1 to the
    // true source (the swap is ONE edit under full DL), DL 2 to the
    // decoy (same swap + the digit substitution) — argmin still finds
    // the source; FunctionsSpec pins the kernel cases
    val cand = Seq(
      (100L, 1, "red widgte #7", 1, "red widget #7"),
      (100L, 1, "red widgte #7", 2, "red widget #9"))
      .toDF("did", "src", "dname", "cid", "cname")
    val d = cand
      .select($"cid", damerau_levenshtein($"dname", $"cname").as("dl"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(d === Map(1 -> 1, 2 -> 2))
    // and Spark's builtin levenshtein indeed charges the swap double
    val lev = cand.where($"cid" === 1)
      .select(levenshtein($"dname", $"cname")).head.getInt(0)
    assert(lev === 2)
  }
}
