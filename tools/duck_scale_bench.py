#!/usr/bin/env python3
"""DuckDB twin of graft.tools.ScaleBench over the same generated parquet.

Usage: python3 tools/duck_scale_bench.py /tmp/graftbench/d100000000
"""
import sys
import time

import duckdb

QS = {
    "filterCount": "SELECT COUNT(*) FROM t WHERE age > 40 AND active",
    "groupByDept": "SELECT dept, COUNT(*) FROM t GROUP BY dept",
    "sumAge": "SELECT SUM(age) FROM t",
    "avgAge": "SELECT AVG(age) FROM t",
    "minMaxAge": "SELECT MIN(age), MAX(age) FROM t",
    "groupByDeptCity": "SELECT dept, city, COUNT(*) FROM t GROUP BY dept, city",
    "filterGroupBy": "SELECT dept, COUNT(*) FROM t WHERE active GROUP BY dept",
    "countDistinctDept": "SELECT COUNT(DISTINCT dept) FROM t",
    "compoundAnd": "SELECT COUNT(*) FROM t WHERE age > 30 AND age < 50 AND active",
}


def main(path):
    con = duckdb.connect(config={"threads": 32})
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{path}/*.parquet'")
    out = {}
    for name, q in QS.items():
        con.sql(q).fetchall()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            con.sql(q).fetchall()
            ts.append((time.time() - t0) * 1000)
        out[name] = min(ts)
        print(f"{name:20s} {min(ts):8.1f} ms")
    print({"metric": "duckdb_scale_bench_ms", "queries": out})


if __name__ == "__main__":
    main(sys.argv[1])
