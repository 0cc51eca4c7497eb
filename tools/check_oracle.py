#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
       python3 tools/check_oracle.py --selftest

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables
registered as views over sfDir parquet), sort columns by name, and diff
TYPES first, then values.

The type check exists because the driver's hash is TYPE-sensitive and
value-only comparison is not: round 9's q286 emitted identical values
as Spark DECIMAL(38,0) vs oracle HUGEINT — this script passed
(Python's Decimal(123) == 123), the driver flipped the row red. Types
come from DuckDB's DESCRIBE of both sides, so the comparison sees the
same logical types the driver's DuckDB session sees. TYPE_EQUIV lists
the pairs the driver demonstrably hashes as equal (evidenced by rows
that were green in a driver CORRECTNESS artifact despite the skew);
it starts empty — add a pair only with that evidence.
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Frozen-set pairs of DuckDB type strings the driver's hash treats as
# equal, each with the driver artifact that proves it.
#
# INTEGER/BIGINT: CORRECTNESS_r09.json has q168_curriculum_order,
# q182_span_corruption, q183_phrase_search, q190_seasonal_decompose all
# hash_match=true while carrying exactly this skew (Spark INT vs oracle
# BIGINT, surfaced by this script's round-10 sweep) — the driver
# unifies integer widths. DECIMAL(38,0) vs HUGEINT is NOT equivalent
# (q286 flipped red on it in the same artifact), so the families do
# not mix.
TYPE_EQUIV = {frozenset(("INTEGER", "BIGINT"))}


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # repr, not the float: Python's -0.0 == 0.0 made the row
                # SETS compare equal while the str-based sort key split
                # them (q166 at sf0.1 — 191 spurious positional diffs),
                # and a byte-level driver hash DOES distinguish signed
                # zeros, so the replica must too. repr also makes
                # NaN == NaN, matching a byte hash. UNROUNDED (round-10
                # ADVICE): the driver hash is byte-level, so a
                # divergence in the 10th decimal is a real red — the
                # old round(v, 9) masked exactly that class.
                v = repr(v)
            rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), \
        [cols[i] for i in order]


def described_types(con, query):
    """{column: duckdb type string} for an arbitrary SELECT."""
    return {r[0]: r[1]
            for r in con.sql(f"DESCRIBE ({query})").fetchall()}


def type_mismatches(got_types, exp_types):
    """Columns whose DuckDB logical types differ (modulo TYPE_EQUIV)."""
    bad = []
    for c in sorted(set(got_types) & set(exp_types)):
        g, e = got_types[c], exp_types[c]
        if g != e and frozenset((g, e)) not in TYPE_EQUIV:
            bad.append((c, g, e))
    return bad


def check_one(con, name, spark_glob, sql):
    """Returns None if ok, else a failure message."""
    try:
        got_q = f"SELECT * FROM {spark_glob}"
        gtypes = described_types(con, got_q)
        etypes = described_types(con, sql)
        got = con.sql(got_q)
        grows, gcols = canon(got.fetchall(), [d[0] for d in got.description])
        exp = con.sql(sql)
        erows, ecols = canon(exp.fetchall(), [d[0] for d in exp.description])
    except Exception as e:
        return f"{e}"
    if gcols != ecols:
        return f"columns {gcols} != {ecols}"
    tbad = type_mismatches(gtypes, etypes)
    if tbad:
        return ("types (spark vs oracle): " +
                ", ".join(f"{c}: {g} != {e}" for c, g, e in tbad))
    if grows != erows:
        diffs = [(a, b) for a, b in zip(grows, erows) if a != b]
        return (f"{len(grows)} vs {len(erows)} rows, "
                f"first diffs: {diffs[:3]}")
    return None


def selftest():
    """The replica must flag a deliberately type-skewed fixture whose
    VALUES are identical — the exact q286 bug class."""
    con = duckdb.connect()
    import tempfile, os
    d = tempfile.mkdtemp()
    pq = os.path.join(d, "r.parquet")
    # Spark-side stand-in: d2 lands as DECIMAL(38,0) in parquet
    con.execute(
        f"COPY (SELECT 1 AS k, CAST(123 AS DECIMAL(38,0)) AS d2) "
        f"TO '{pq}' (FORMAT PARQUET)")
    skew = check_one(con, "skew", f"'{pq}'",
                     "SELECT 1 AS k, CAST(123 AS HUGEINT) AS d2")
    assert skew and "types" in skew, f"type skew not flagged: {skew!r}"
    ok = check_one(con, "ok", f"'{pq}'",
                   "SELECT 1 AS k, CAST(123 AS DECIMAL(38,0)) AS d2")
    assert ok is None, f"aligned fixture failed: {ok!r}"
    vals = check_one(con, "vals", f"'{pq}'",
                     "SELECT 1 AS k, CAST(124 AS DECIMAL(38,0)) AS d2")
    assert vals and "diffs" in vals, f"value diff not flagged: {vals!r}"
    # byte-fidelity float compare (round-11): a 1-ulp divergence
    # beyond the old 9dp canon rounding must be flagged — the exact
    # q246 class (0.04966329966329966 vs ...63, identical at 9dp).
    pq2 = os.path.join(d, "f.parquet")
    con.execute(
        f"COPY (SELECT 1 AS k, 0.04966329966329966::DOUBLE AS v) "
        f"TO '{pq2}' (FORMAT PARQUET)")
    ulp = check_one(con, "ulp", f"'{pq2}'",
                    "SELECT 1 AS k, 0.04966329966329963::DOUBLE AS v")
    assert ulp and "diffs" in ulp, f"1-ulp float diff not flagged: {ulp!r}"
    same = check_one(con, "same", f"'{pq2}'",
                     "SELECT 1 AS k, 0.04966329966329966::DOUBLE AS v")
    assert same is None, f"bit-identical float failed: {same!r}"
    print("selftest ok: type skew, value diff, and sub-9dp float diff "
          "all flagged; aligned fixtures pass")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        msg = check_one(con, name, f"'{out_dir}/{name}/*.parquet'", sql)
        if msg is None:
            n_rows = con.sql(
                f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
            ).fetchone()[0]
            print(f"ok   {name} ({n_rows} rows)")
            n_ok += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
