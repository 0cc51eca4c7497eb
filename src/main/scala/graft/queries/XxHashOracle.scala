package graft.queries

/** DuckDB-SQL replica of Spark's `xxhash64` (XXH64, seed 42) over
  * short ASCII strings — the arithmetic that graduates q28 from
  * rows-only to value-exact (round-7 verdict #6, the q29 PolyHash
  * precedent: hash recurrences are plain integer arithmetic, so the
  * oracle replays them mod 2⁶⁴ in HUGEINT instead of trusting the
  * engine).
  *
  * Shape: a WITH-chain of small CTEs, one hash-state mutation each —
  * DuckDB evaluates each CTE as a projection operator, so the state
  * threads through columns. (The tempting alternatives both explode:
  * lateral column aliases are textually substituted at bind time —
  * the 2^depth copy blow-up hung the planner — and a scalar macro is
  * a second SQL statement, which the driver's single-statement
  * execute cannot run.)
  *
  * mul64(a,b) is 128-bit-safe: a,b < 2⁶⁴ makes a·b overflow signed
  * HUGEINT, so the product is split a = ah·2³² + al and reassembled
  * mod 2⁶⁴; rotl(x,r) = (x·2ʳ mod 2⁶⁴) + x/2⁶⁴⁻ʳ (the two parts are
  * disjoint bit ranges, so + is |).
  *
  * Domain: ASCII tokens (ascii(c) == the UTF-8 byte, the q29 rule) of
  * length ≤ 15 — one unrolled 8-byte round + the 4-byte and ≤3-byte
  * tails, the fixtures' whole range (max token length is 8 at every
  * SF). A ≥16-byte token yields NULL, which diverges from Spark and
  * turns the gate red — an honest loud failure, never a silently
  * wrong hash.
  *
  * Validated two ways: against a from-spec XXH64 reimplementation on
  * edge-length tokens, and token-for-token against Spark's own
  * xxhash64 over every distinct fixture token (SimHashOracleSpec).
  */
object XxHashOracle {

  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"
  private val M = "18446744073709551616"

  private def m64(a: String, b: String): String =
    s"(((($a // 4294967296) * $b) % 4294967296) * 4294967296" +
      s" + ($a % 4294967296) * $b) % $M"

  private def rot(x: String, r: Int): String =
    s"(($x * ${BigInt(1) << r}::HUGEINT) % $M" +
      s" + ($x // ${BigInt(1) << (64 - r)}::HUGEINT))"

  private def x64(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)::HUGEINT"

  /** CTE chain `x0 .. xh` computing `hu` (unsigned HUGEINT) and
    * `h_signed` (Spark's BIGINT) for column `t` of CTE `src`, with
    * `carry` columns threaded through. Splice after a `toks` CTE:
    * `WITH toks AS (...), ${XxHashOracle.ctes("toks", Seq("doc_id"))},
    * ...` and read from `xh`. */
  def ctes(src: String, carry: Seq[String]): String = {
    val cc = carry.mkString(", ")
    val c2 = s"$cc, n, c, nw"
    val c3 = s"$c2, bb"
    val word0 = "(" + (0 until 8)
      .map(i => s"c[${i + 1}]*${BigInt(256).pow(i)}::HUGEINT")
      .mkString(" + ") + ")"
    val steps = Seq(
      s"""x0 AS (SELECT $cc, length(t) AS n,
          list_transform(range(1, length(t) + 1),
            i -> CAST(ascii(t[i]) AS HUGEINT)) AS c,
          length(t) // 8 AS nw,
          (42::HUGEINT + $P5 + length(t)) % $M AS h FROM $src)""",
      s"""xwa AS (SELECT $c2, h, CASE WHEN nw >= 1
          THEN ${m64(word0, P2)} ELSE 0 END AS k1 FROM x0)""",
      s"""xwb AS (SELECT $c2, h, ${m64(rot("k1", 31), P1)} AS k2 FROM xwa)""",
      s"""xwc AS (SELECT $c2, CASE WHEN nw >= 1
          THEN ${x64("h", "k2")} ELSE h END AS h FROM xwb)""",
      s"""xwd AS (SELECT $c2, CASE WHEN nw >= 1
          THEN (${m64(rot("h", 27), P1)} + $P4) % $M ELSE h END AS h FROM xwc)""",
      s"""x4a AS (SELECT $c2, h, CASE WHEN n - 8*nw >= 4
          THEN c[8*nw+1] + c[8*nw+2]*256 + c[8*nw+3]*65536 + c[8*nw+4]*16777216
          ELSE 0 END AS w4 FROM xwd)""",
      s"""x4b AS (SELECT $c2, CASE WHEN n - 8*nw >= 4
          THEN ${x64("h", m64("w4", P1))} ELSE h END AS h,
          n - 8*nw >= 4 AS had4 FROM x4a)""",
      s"""x4c AS (SELECT $c2, CASE WHEN had4
          THEN (${m64(rot("h", 23), P2)} + $P3) % $M ELSE h END AS h,
          8*nw + CASE WHEN had4 THEN 4 ELSE 0 END AS bb FROM x4b)""") ++
      (1 to 3).flatMap { j =>
        Seq(
          s"""xt${j}a AS (SELECT $c3, CASE WHEN n >= bb + $j
              THEN ${x64("h", m64(s"c[bb+$j]", P5))} ELSE h END AS h,
              n >= bb + $j AS hit FROM ${if (j == 1) "x4c" else s"xt${j - 1}b"})""",
          s"""xt${j}b AS (SELECT $c3, CASE WHEN hit
              THEN ${m64(rot("h", 11), P1)} ELSE h END AS h FROM xt${j}a)""")
      } ++ Seq(
      s"""xf1 AS (SELECT $c3, ${x64("h", "h // 8589934592")} AS h FROM xt3b)""",
      s"""xf2 AS (SELECT $c3, ${m64("h", P2)} AS h FROM xf1)""",
      s"""xf3 AS (SELECT $c3, ${x64("h", "h // 536870912")} AS h FROM xf2)""",
      s"""xf4 AS (SELECT $c3, ${m64("h", P3)} AS h FROM xf3)""",
      // n >= 16 would need a second word round: NULL diverges loudly
      s"""xh AS (SELECT $c3, CASE WHEN n >= 16 THEN NULL
          ELSE ${x64("h", "h // 4294967296")} END AS hu,
          CAST(CASE WHEN n >= 16 THEN NULL
            WHEN ${x64("h", "h // 4294967296")} >= 9223372036854775808
            THEN ${x64("h", "h // 4294967296")} - $M
            ELSE ${x64("h", "h // 4294967296")} END AS BIGINT) AS h_signed
          FROM xf4)""")
    steps.mkString(",\n      ")
  }
}
