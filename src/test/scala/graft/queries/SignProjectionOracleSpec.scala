package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SignProjectionBucket
import graft.text.Dedup

/** Validates the q144 oracle's arithmetic the way SimHashOracleSpec
  * validated the XXH64 replay: re-derive the DuckDB SQL's HUGEINT
  * construction in BigInt (the same 32-bit-split multiply, floor-div
  * shifts, xor, and exact float finish the SQL text encodes) and
  * require it to equal Spark's `planeComponent` for every plane the
  * fixture geometry uses — and well past it. If `planeComponent` or
  * the SQL construction ever drift apart, this fails before the gate
  * does, with the exact (plane, component) coordinate.
  */
class SignProjectionOracleSpec extends AnyFunSuite {

  private val M = BigInt(1) << 64
  private val mask32 = BigInt(1) << 32
  private val C1 = BigInt("11400714819323198485")
  private val C2 = BigInt("13787848793156543929")
  private val C3 = BigInt("10723151780598845931")

  /** The SQL's mul64: ((a//2³²)·b mod 2³²)·2³² + (a mod 2³²)·b, mod 2⁶⁴. */
  private def m64(a: BigInt, b: BigInt): BigInt =
    ((((a / mask32) * b) % mask32) * mask32 + (a % mask32) * b).mod(M)

  private def sqlPlaneComponent(g: Int, j: Int): Double = {
    var z = (BigInt(g) * C1 + BigInt(j) * C2).mod(M)
    z = m64(z ^ (z / (BigInt(1) << 30)), C2)
    z = m64(z ^ (z / (BigInt(1) << 27)), C3)
    z = z ^ (z / (BigInt(1) << 31))
    (z / BigInt(2048)).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  test("SQL HUGEINT replay == planeComponent, bit for bit") {
    // fixture geometry is 8 tables × 4 planes × 64 dims (g < 32);
    // sweep to g < 320 ≈ 8 tables × 40 planes, the 100 TB dispatch top
    for (g <- 0 until 320; j <- 0 until 64) {
      val expected = SignProjectionBucket.planeComponent(g, j)
      val replayed = sqlPlaneComponent(g, j)
      assert(java.lang.Double.doubleToLongBits(replayed) ===
        java.lang.Double.doubleToLongBits(expected),
        s"plane ($g, $j): SQL replay $replayed != Spark $expected")
    }
  }

  test("the oracle's dispatch mirror == lshPlanesFor at boundaries") {
    // SQL: GREATEST(4, max{k : 100·2^k <= n}) — exact at the n=100·2^k
    // boundaries where the old double-log form could carry dust
    def sqlPlanes(n: Long): Int = {
      val ks = (0 until 63).filter(k => BigInt(100) * (BigInt(1) << k) <= n)
      math.max(4, if (ks.isEmpty) 0 else ks.max)
    }
    for (n <- Seq(1L, 99L, 100L, 199L, 200L, 500L, 2000L, 3199L, 3200L,
        6400L, 102399L, 102400L, 102401L, 1000000000L))
      assert(Dedup.lshPlanesFor(n) === sqlPlanes(n), s"n=$n")
  }

  test("the final float step of planeComponent is exact arithmetic") {
    // (z >>> 11) < 2^53 and the /2^52, ×2, −1 chain stays on exactly
    // representable values — the property that makes a cross-engine
    // float replay honest. Verify representability at the extremes.
    val top = (BigInt(1) << 53) - 1
    val x = top.toDouble / (1L << 52).toDouble * 2.0 - 1.0
    assert(BigInt(top.toDouble.toLong) === top) // 2^53-1 exact as double
    assert(x === ((top.toDouble * 2.0) / (1L << 52).toDouble - 1.0))
  }
}
