#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [onlyCommaList]

Replays each oracle_sql.json query in DuckDB over the raw testdata parquet
and compares it (columns sorted by name, exact values, row order respected)
to the Spark result parquet that graft.Verify wrote.

The comparison is TYPE-STRICT: the DuckDB-described column types of the Spark
result relation must equal the oracle relation's types (after a small
canonicalization for storage-level aliases). The driver's hash is type-tagged,
so an oracle that lets DuckDB widen (e.g. SUM(BIGINT) -> HUGEINT while Spark
writes int64) must fail HERE, not at the driver. Cast the oracle, not this
check.
"""
import json
import math
import sys

import duckdb


def canon_type(t):
    """Canonicalize a DuckDB type name into the equivalence class the
    driver's type-tagged hash uses (established empirically from round-7
    driver results):

    - integer widths TINYINT..BIGINT hash EQUAL (q_window_rank's INTEGER
      row_number vs DuckDB BIGINT passed) — but HUGEINT does NOT
      (t_time_weighted's uncast SUM(BIGINT) -> HUGEINT was the round-7
      red row);
    - DECIMAL(p,s) hashes equal to DOUBLE (x_quality passed), but two
      DECIMALs of different width stay distinct, so width drift between
      a Spark decimal result and the oracle is still flagged;
    - all timestamp flavors are storage aliases of one type.
    """
    s = str(t).upper()
    if s.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    return s


def types_compatible(a, b):
    ca, cb = canon_type(a), canon_type(b)
    if ca == cb:
        return True
    pair = {ca, cb}
    if "DOUBLE" in pair and any(t.startswith("DECIMAL") for t in pair):
        return True
    return False


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


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
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
        got_types = {c: str(t).upper() for c, t in zip(got.columns, got.types)}
        exp_types = {c: str(t).upper() for c, t in zip(exp.columns, exp.types)}
        type_diffs = [(c, got_types.get(c), exp_types.get(c))
                      for c in exp_cols
                      if c in got_types and
                      not types_compatible(got_types[c], exp_types[c])]
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif type_diffs:
            print(f"FAIL {name}: column types diverge (spark vs oracle): "
                  f"{type_diffs} — cast the oracle SQL explicitly")
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
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
