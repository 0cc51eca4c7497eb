package graft.queries

/** DuckDB-SQL replica of the q144 LSH semantic-dedup derivation — the
  * arithmetic that graduates it from rows-only to value-exact, closing
  * the round-8 verdict #5 probe with a graduation instead of a second
  * rejection.
  *
  * The earlier rejection (COVERAGE.md round-5 appendix) compared the
  * LSH components against the EXACT q132 components and correctly
  * found recall < 1 — but that was the wrong oracle question. After
  * the [[XxHashOracle]] precedent the right question is: can DuckDB
  * replay q144's OWN derivation bit-for-bit? It can, because every
  * stage is deterministic arithmetic with a fixed evaluation order:
  *
  *  1. the plane matrix is a splitmix-style integer mix of
  *     (plane, component) ([[graft.functions.SignProjectionBucket
  *     .planeComponent]]) — mod-2⁶⁴ integer arithmetic, replayed in
  *     HUGEINT with the [[XxHashOracle]] mul64 split; the final
  *     `(z >>> 11) / 2^52 * 2 − 1` float step is EXACT (the operand
  *     is < 2⁵³ and the divisor/multiplier are powers of two, so the
  *     subtraction result is representable);
  *  2. every dot product (`SignProjectionBucket`'s projection loop,
  *     `DotProduct`, `L2Norm`) is a strict left-to-right double sum —
  *     `list_reduce(list_prepend(0.0, list_transform(...)))` replays
  *     the identical IEEE addition sequence INCLUDING each loop's
  *     length rule (projection and dot truncate to min(len, dim) /
  *     min(len a, len b); the norms walk the full array — a fixed
  *     1..dim range would NULL-poison short vectors' folds), and
  *     `sqrt` is correctly rounded on both engines, so the `> 0` sign
  *     tests and the `>= threshold` cosine verification see
  *     bitwise-equal doubles;
  *  3. the geometry dispatch ([[graft.text.Dedup.lshPlanesFor]]) is
  *     integer bit-length arithmetic (made so in round 9 exactly for
  *     this replay), mirrored as MAX(k) over 100·2^k ≤ COUNT(*);
  *  4. the components fixpoint replays as the q132 WITH RECURSIVE
  *     min-label walk.
  *
  * Validated three ways: SignProjectionOracleSpec replays the HUGEINT
  * construction in BigInt mod-2⁶⁴ and compares every plane component
  * of the fixture geometry against `planeComponent`; a driver-side
  * prototype matched the SQL against an independent Python
  * reimplementation at sf0.01 AND sf0.1 (0 diffs in labels and in all
  * 2048 plane components); and the gate itself hash-compares the full
  * output per round.
  */
object SignProjectionOracle {

  private val M = "18446744073709551616"
  /** splitmix64 constants, unsigned decimal for HUGEINT literals:
    * 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB. */
  private val C1 = "11400714819323198485"
  private val C2 = "13787848793156543929"
  private val C3 = "10723151780598845931"

  /** a·b mod 2⁶⁴ with a < 2⁶⁴: split a into 32-bit halves so the
    * HUGEINT intermediate never overflows (the XxHashOracle form). */
  private def m64(a: String, b: String): String =
    s"((((($a) // 4294967296) * ($b)) % 4294967296) * 4294967296" +
      s" + (($a) % 4294967296) * ($b)) % $M"

  private def x64(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)::HUGEINT"

  /** Left-to-right double sum of `expr(i)` for i in 1..bound — the
    * IEEE addition order of the native vector loops. `bound` is an
    * SQL expression so each call replays its Spark twin's length rule
    * exactly (SignProjectionBucket and DotProduct truncate to
    * min(len, dim) / min(len a, len b); L2Norm walks the full array)
    * — a fixed 1..dim range would NULL-poison the fold on any vector
    * shorter than dim and silently zero every bucket. */
  private def sumLR(bound: String, expr: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, ($bound) + 1)," +
      s" i -> $expr)), (acc, x) -> acc + x)"

  /** The q144 oracle: sign-LSH buckets → candidate pairs → exact
    * cosine verify → connected components → (vec_id, component,
    * is_keeper). Parameters mirror the catalog entry's call. */
  def semanticDedupSql(threshold: Double, dim: Int, tables: Int,
                       targetBucket: Int = 100): String =
    s"""WITH RECURSIVE
      par AS (
        SELECT GREATEST(4, COALESCE((
          SELECT MAX(k) FROM range(0, 63) t(k),
            (SELECT COUNT(*) AS cnt FROM embeddings) c
          WHERE $targetBucket::HUGEINT * CAST(pow(2, k) AS HUGEINT) <= c.cnt),
          0)) AS planes),
      gp AS (
        SELECT t.t, p.p, CAST(t.t * par.planes + p.p AS HUGEINT) AS g
        FROM range(0, $tables) t(t), par, range(0, 63) p(p)
        WHERE p.p < par.planes),
      z0 AS (
        SELECT g, t, p, j.j,
          (g * $C1::HUGEINT + j.j * $C2::HUGEINT) % $M AS z
        FROM gp, range(0, $dim) j(j)),
      z1 AS (SELECT g, t, p, j,
        (${m64(x64("z", "z // 1073741824"), s"$C2::HUGEINT")}) AS z FROM z0),
      z2 AS (SELECT g, t, p, j,
        (${m64(x64("z", "z // 134217728"), s"$C3::HUGEINT")}) AS z FROM z1),
      pcom AS (SELECT g, t, p, j,
          CAST((${x64("z", "z // 2147483648")}) // 2048 AS DOUBLE)
            / 4503599627370496.0 * 2.0 - 1.0 AS comp
        FROM z2),
      pl AS (SELECT t, p, list(comp ORDER BY j) AS pc FROM pcom GROUP BY 1, 2),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dots AS (
        SELECT e.vec_id, pl.t, pl.p,
          ${sumLR(s"LEAST(len(e.v), $dim)", "e.v[i] * pl.pc[i]")} AS s
        FROM e, pl),
      bk AS (
        SELECT vec_id, t,
          SUM(CASE WHEN s > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS b
        FROM dots GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
        FROM bk x JOIN bk y
          ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
      vv AS (
        SELECT c.vec_a, c.vec_b,
          ${sumLR("LEAST(len(ea.v), len(eb.v))", "ea.v[i] * eb.v[i]")} AS dp,
          sqrt(${sumLR("len(ea.v)", "ea.v[i] * ea.v[i]")}) AS na,
          sqrt(${sumLR("len(eb.v)", "eb.v[i] * eb.v[i]")}) AS nb
        FROM cand c
          JOIN e ea ON ea.vec_id = c.vec_a
          JOIN e eb ON eb.vec_id = c.vec_b),
      vp AS (SELECT vec_a, vec_b FROM vv WHERE dp / (na * nb) >= $threshold),
      edges AS (SELECT vec_a AS s, vec_b AS d FROM vp
        UNION ALL SELECT vec_b, vec_a FROM vp),
      walk(n, r) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT g2.d, w.r FROM walk w JOIN edges g2 ON g2.s = w.n),
      comp AS (SELECT n AS vec_id, MIN(r) AS component FROM walk GROUP BY 1)
      SELECT vec_id, component,
        CAST(CASE WHEN vec_id = component THEN 1 ELSE 0 END AS INTEGER)
          AS is_keeper
      FROM comp ORDER BY vec_id"""
}
