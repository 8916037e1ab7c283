#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Replays each oracle_sql.json query in DuckDB over the raw testdata parquet
and compares it (columns sorted by name, exact values, row order respected)
to the Spark result parquet that graft.Verify wrote.
"""
import json
import math
import sys

import duckdb


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = [tuple(canon(v) for v in row) for row in
                        con.sql(f"SELECT {', '.join(got_cols)} FROM got").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [tuple(canon(v) for v in row) for row in
                        con.sql(f"SELECT {', '.join(exp_cols)} FROM exp").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            diffs = [(i, g, e) for i, (g, e) in
                     enumerate(zip(got_rows, exp_rows)) if g != e]
            print(f"FAIL {name}: rows {len(got_rows)} vs {len(exp_rows)}, "
                  f"first diffs: {diffs[:3]}"
                  + (f" extra_got={got_rows[len(exp_rows):][:2]}" if len(got_rows) > len(exp_rows) else "")
                  + (f" extra_exp={exp_rows[len(got_rows):][:2]}" if len(exp_rows) > len(got_rows) else ""))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
