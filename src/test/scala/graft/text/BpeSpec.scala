package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Sennrich et al.'s textbook vocabulary
  private val textbook = Array(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("first merges on the textbook vocab are the classic (e,s)(es,t)(est,</w>)") {
    val merges = Bpe.learnMerges(textbook, nMerges = 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow)))
  }

  test("encoding is consistent with training: trained words round-trip") {
    val merges = Bpe.learnMerges(textbook, nMerges = 10)
    val rank = merges.zipWithIndex.toMap
    // after enough merges the most frequent word collapses to one token
    assert(Bpe.encodeWord("newest", rank).length <= 2)
    // an unseen word still encodes (falls back toward characters)
    val unseen = Bpe.encodeWord("lowest", rank)
    assert(unseen.mkString === "lowest" + Bpe.Eow)
  }

  test("merge learning agrees with an independent naive reimplementation") {
    // naive: recount all pairs from scratch each round over expanded
    // word multiset (no frequency table tricks)
    val corpus: Seq[String] =
      textbook.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }.toSeq
    def naive(n: Int): Seq[(String, String)] = {
      var words = corpus.map(w => w.map(_.toString).toVector :+ Bpe.Eow)
      (1 to n).flatMap { _ =>
        val counts = words.flatMap(s => s.zip(s.tail))
          .groupBy(identity).map { case (p, xs) => p -> xs.size }
        if (counts.isEmpty) None
        else {
          val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          words = words.map { syms =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += syms(i) + syms(i + 1); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result()
          }
          Some(best)
        }
      }
    }
    assert(Bpe.learnMerges(textbook, 6) === naive(6))
  }

  test("corpus training compresses and is deterministic end to end") {
    val docs = graft.model.Tables.documents(spark, SparkTestSession.Sf0001)
    val merges = Bpe.learnMerges(Bpe.wordCounts(docs), nMerges = 30)
    assert(merges.length === 30)
    val counts = Bpe.tokenCounts(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // BPE tokens are at most chars+1 per word and at least 1 per word
    assert(counts.forall { case (_, ws, bpe) => bpe >= ws })
    val again = Bpe.learnMerges(Bpe.wordCounts(docs), nMerges = 30)
    assert(again === merges)
    // merges actually fire on the corpus: some word encodes to fewer
    // symbols than its character count
    val rank = merges.zipWithIndex.toMap
    val w = Bpe.wordCounts(docs).head._1
    assert(Bpe.encodeWord(w, rank).length < w.length + 1)
  }
}
