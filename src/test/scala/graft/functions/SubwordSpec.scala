package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SubwordSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vocab = Seq("spar", "wind", "ow", "the", "ab", "abc") ++
    ('a' to 'z').filter(_ != 'k').map(_.toString)

  private def set = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(s.add)
    s
  }

  private def seg(w: String): (Long, Long) = {
    val packed = Subword.segment(w, set, 4)
    (packed >>> 32, packed & 0xFFFFFFFFL)
  }

  test("greedy longest match wins over shorter pieces") {
    // "abc" matches the 3-piece, not "ab"+"c"
    assert(seg("abc") === ((1L, 0L)))
    assert(seg("abd") === ((2L, 0L))) // "ab" + "d"
  }

  test("unmatched chars advance one char and count as fallback") {
    assert(seg("spark") === ((2L, 1L))) // "spar" + k-fallback
    assert(seg("kab") === ((2L, 1L)))   // k-fallback + "ab"
  }

  test("full coverage: piece lengths sum to the word length") {
    // "window" = "wind" + "ow"
    assert(seg("window") === ((2L, 0L)))
    // all-fallback word (no piece, no single char)
    assert(seg("kk") === ((2L, 2L)))
  }

  test("empty word is zero pieces") {
    assert(seg("") === ((0L, 0L)))
  }

  test("codegen'd column path agrees with the direct call") {
    val words = Seq("spark", "window", "the", "kab", "abcabd").toDF("w")
    val got = words.select(col("w"),
        Subword.subword_stats(col("w"), vocab, 4).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("spark", "window", "the", "kab", "abcabd").foreach { w =>
      assert(got(w) === Subword.segment(w, set, 4), s"mismatch for $w")
    }
  }

  test("pieces path agrees with the counting path and reconstructs the word") {
    Seq("spark", "window", "kab", "abcabd", "the", "kk").foreach { w =>
      val ps = Subword.pieces(w, set, 4).map(_.toString)
      val (np, nf) = seg(w)
      assert(ps.length === np, s"piece count for $w")
      assert(ps.mkString("") === w, s"pieces must concatenate to $w")
      // fallback pieces are exactly the emitted pieces not in the vocab
      assert(ps.count(p => !vocab.contains(p)) === nf, s"fallbacks for $w")
    }
  }

  test("codegen'd pieces column agrees with the direct call") {
    val words = Seq("spark", "window", "kab").toDF("w")
    val got = words.select(col("w"),
        Subword.subword_pieces(col("w"), vocab, 4).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    got.foreach { case (w, ps) =>
      assert(ps === Subword.pieces(w, set, 4).map(_.toString).toSeq)
    }
  }

  test("a piece longer than maxLen is refused") {
    intercept[IllegalArgumentException] {
      SubwordStats(null, Seq("abcde"), 4)
    }
  }
}
