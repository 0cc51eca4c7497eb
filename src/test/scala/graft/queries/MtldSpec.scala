package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plain-Scala replay + limit pins for q277 MTLD — the repetition
  * regimes the fixture can't isolate, and a row-for-row replay of the
  * factor fold.
  */
class MtldSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  /** Reference fold — the exact q277 recurrence. */
  private def ref(toks: Seq[String]): Double = {
    var seen = Set.empty[String]; var tokf = 0; var factors = 0.0
    toks.foreach { t =>
      val s2 = seen + t; val tf2 = tokf + 1
      if (s2.size.toDouble / tf2 < 0.72) { seen = Set.empty; tokf = 0
        factors += 1 }
      else { seen = s2; tokf = tf2 }
    }
    factors + (if (tokf > 0) (1 - seen.size.toDouble / tokf) / (1 - 0.72)
      else 0.0)
  }

  test("q277: pure repetition factors every 2 tokens; mtld = 2") {
    // "a a a a a a a a a a": ttr hits 1/2 on every second token
    val r = TextQueries.mtld(docs(Seq.fill(10)("a").mkString(" ")))
      .collect().head
    assert(r.getLong(1) === 10)
    assert(r.getDouble(2) === 5.0)   // factors
    assert(r.getDouble(3) === 2.0)   // mtld
  }

  test("q277: an all-distinct doc never closes a factor (mtld null)") {
    // ttr stays 1 → zero full factors and a zero partial → ft = 0
    val r = TextQueries.mtld(docs((1 to 8).map("w" + _).mkString(" ")))
      .collect().head
    assert(r.getDouble(2) === 0.0)
    assert(r.isNullAt(3))
  }

  test("q277: empty and whitespace-only docs tokenize to zero tokens") {
    // split("\\s+") on "" / "   " yields one empty string; both the
    // Spark filter(length>0) and the oracle's list_filter drop it, so
    // n_toks=0, factors=0, mtld null — not the ntok=1 an unfiltered
    // engine would report (the ADVICE-flagged latent divergence).
    val rs = TextQueries.mtld(docs("", "   \t  ")).collect()
    rs.foreach { r =>
      assert(r.getLong(1) === 0L)
      assert(r.getDouble(2) === 0.0)
      assert(r.isNullAt(3))
    }
  }

  test("q277: the Spark fold replays the reference loop") {
    val text = "the cat sat on the mat the dog sat on the cat " +
      "a b a b c d the end"
    val toks = text.split("\\s+").toSeq
    val r = TextQueries.mtld(docs(text)).collect().head
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    assert(r.getDouble(2) === r4(ref(toks)))
    assert(r.getDouble(3) === r4(toks.size / ref(toks)))
  }
}
