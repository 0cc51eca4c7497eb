package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Closes the q28-graduation validation loop on the JVM side: a
  * from-spec XXH64 (seed 42) reimplementation in plain Scala must
  * match Spark's `xxhash64` for every distinct fixture token and an
  * edge-length battery. [[XxHashOracle]]'s SQL was validated against
  * the same from-spec arithmetic in DuckDB (byte-identical on the
  * battery), so Spark == Scala-ref == SQL — and the oracle gate then
  * re-proves Spark == SQL end-to-end on every run.
  */
class SimHashOracleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val M = BigInt(1) << 64
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")

  private def rotl(x: BigInt, r: Int): BigInt =
    ((x << r) | (x >> (64 - r))) % M

  /** Reference XXH64 (public spec), seed 42, any length. */
  private def xxh64(data: Array[Byte], seed: Long = 42L): BigInt = {
    val n = data.length
    def word8(off: Int): BigInt =
      (0 until 8).map(i => BigInt(data(off + i) & 0xff) << (8 * i)).sum
    var off = 0
    var h: BigInt =
      if (n >= 32) {
        var v1 = (BigInt(seed) + P1 + P2) % M
        var v2 = (BigInt(seed) + P2) % M
        var v3 = BigInt(seed) % M
        var v4 = (BigInt(seed) - P1 + M) % M
        while (off + 32 <= n) {
          v1 = (rotl((v1 + word8(off) * P2) % M, 31) * P1) % M
          v2 = (rotl((v2 + word8(off + 8) * P2) % M, 31) * P1) % M
          v3 = (rotl((v3 + word8(off + 16) * P2) % M, 31) * P1) % M
          v4 = (rotl((v4 + word8(off + 24) * P2) % M, 31) * P1) % M
          off += 32
        }
        var acc = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) % M
        for (v <- Seq(v1, v2, v3, v4)) {
          acc = (acc ^ ((rotl((v * P2) % M, 31) * P1) % M)) % M
          acc = ((acc * P1) % M + P4) % M
        }
        acc
      } else (BigInt(seed) + P5) % M
    h = (h + n) % M
    while (off + 8 <= n) {
      val k1 = (rotl((word8(off) * P2) % M, 31) * P1) % M
      h = ((rotl(h ^ k1, 27) * P1) % M + P4) % M
      off += 8
    }
    if (off + 4 <= n) {
      val w = (0 until 4).map(i => BigInt(data(off + i) & 0xff) << (8 * i)).sum
      h = ((rotl(h ^ ((w * P1) % M), 23) * P2) % M + P3) % M
      off += 4
    }
    while (off < n) {
      h = (rotl(h ^ ((BigInt(data(off) & 0xff) * P5) % M), 11) * P1) % M
      off += 1
    }
    h ^= h >> 33
    h = (h * P2) % M
    h ^= h >> 29
    h = (h * P3) % M
    h ^ (h >> 32)
  }

  private def signed(u: BigInt): Long =
    (if (u >= (BigInt(1) << 63)) u - M else u).toLong

  test("from-spec XXH64 == Spark xxhash64 on an edge-length battery") {
    val toks = Seq("", "a", "ab", "abc", "abcd", "abcde", "abcdef",
      "abcdefg", "abcdefgh", "hello", "12345678", "zz9!~#x%",
      "a" * 9, "a" * 15, "a" * 16, "a" * 31, "a" * 32, "a" * 40, "a" * 64)
    val got = toks.toDF("t")
      .select(col("t"), xxhash64(col("t")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { t =>
      assert(got(t) === signed(xxh64(t.getBytes("UTF-8"))),
        s"xxh64 mismatch on ${t.take(12)} (len ${t.length})")
    }
  }

  test("from-spec XXH64 == Spark xxhash64 on every distinct fixture token") {
    val toks = graft.model.Tables.documents(spark, SparkTestSession.Sf0001)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .distinct()
      .select(col("t"), xxhash64(col("t")).as("h"))
      .collect()
    assert(toks.nonEmpty)
    assert(toks.forall(_.getString(0).length <= 15),
      "fixture tokens exceed XxHashOracle's one-word domain — extend the SQL")
    toks.foreach { r =>
      assert(r.getLong(1) === signed(xxh64(r.getString(0).getBytes("UTF-8"))))
    }
  }
}
