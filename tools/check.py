#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in
DuckDB with each testdata parquet registered under its bare table
name, sorts columns by name and rows by all columns, and compares
values exactly (strictest plausible driver behavior).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = df.values.tolist()
    def key(row):
        return [(isnull(v), str(type(v)), str(v)) for v in row]
    return cols, sorted(rows, key=key)


def isnull(v):
    if v is None:
        return True
    try:
        return v != v  # NaN and NaT are not equal to themselves
    except Exception:
        return False


def eq(a, b):
    if isnull(a) or isnull(b):
        return isnull(a) and isnull(b)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            mine = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            theirs = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        mc, mr = canon(mine)
        tc, tr = canon(theirs)
        if mc != tc:
            print(f"FAIL {name}: columns {mc} vs oracle {tc}")
            n_fail += 1
            continue
        if len(mr) != len(tr):
            print(f"FAIL {name}: rows {len(mr)} vs oracle {len(tr)}")
            n_fail += 1
            continue
        bad = None
        for i, (r1, r2) in enumerate(zip(mr, tr)):
            for c, (v1, v2) in enumerate(zip(r1, r2)):
                if not eq(v1, v2):
                    bad = (i, mc[c], v1, v2)
                    break
            if bad:
                break
        if bad:
            i, c, v1, v2 = bad
            print(f"FAIL {name}: row {i} col {c}: mine={v1!r} oracle={v2!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
