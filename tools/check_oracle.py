#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables
registered as views over sfDir parquet), sort columns by name, sort
rows, and diff values.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), \
        [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows, gcols = canon(got.fetchall(), [d[0] for d in got.description])
            exp = con.sql(sql)
            erows, ecols = canon(exp.fetchall(), [d[0] for d in exp.description])
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_bad += 1
        elif grows != erows:
            diffs = [(a, b) for a, b in zip(grows, erows) if a != b]
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows, "
                  f"first diffs: {diffs[:3]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(grows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
