package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ChunkerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def doc(id: Long, n: Int) =
    (id, (0 until n).map(i => s"t$i").mkString(" "))

  private def run(n: Int, c: Int, s: Int) =
    Chunker.chunks(Seq(doc(1L, n)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), c, s)
      .orderBy("chunk_id").collect()

  test("a doc shorter than one chunk is a single short chunk") {
    val r = run(5, 16, 12)
    assert(r.length === 1)
    assert(r(0).getAs[Int]("n_toks") === 5)
    assert(r(0).getAs[String]("chunk") === "t0 t1 t2 t3 t4")
  }

  test("len == chunkSize is exactly one full chunk") {
    val r = run(16, 16, 12)
    assert(r.length === 1 && r(0).getAs[Int]("n_toks") === 16)
  }

  test("len == chunkSize + 1 spills one short second chunk at the stride") {
    val r = run(17, 16, 12)
    assert(r.length === 2)
    assert(r(1).getAs[Int]("start_tok") === 12)
    assert(r(1).getAs[Int]("n_toks") === 5) // tokens 12..16
  }

  test("consecutive chunks overlap by chunkSize - stride and cover every token") {
    val n = 100; val c = 16; val s = 12
    val rows = run(n, c, s)
    // coverage: union of [start, start+n_toks) is [0, n)
    val covered = rows.flatMap(r => {
      val st = r.getAs[Int]("start_tok"); val k = r.getAs[Int]("n_toks")
      st until (st + k)
    }).toSet
    assert(covered === (0 until n).toSet)
    // every non-terminal chunk is full and overlaps the next by c - s
    rows.init.foreach(r => assert(r.getAs[Int]("n_toks") === c))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Int]("start_tok") - a.getAs[Int]("start_tok") === s)
      case _ =>
    }
    // last chunk carries at least one token not in the previous chunk
    val last = rows.last
    assert(last.getAs[Int]("start_tok") + last.getAs[Int]("n_toks") === n)
    assert(last.getAs[Int]("n_toks") > 0)
  }

  test("chunk text is the exact token slice") {
    val r = run(30, 16, 12)
    assert(r(1).getAs[String]("chunk") ===
      (12 until 28).map(i => s"t$i").mkString(" "))
  }

  test("stride > chunkSize is refused") {
    intercept[IllegalArgumentException] { run(10, 8, 9) }
  }
}
