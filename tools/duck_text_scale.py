#!/usr/bin/env python3
"""DuckDB side of the text-kernel scale comparison: runs the oracle
formulations of minhash signatures and simhash over the replicated
corpus parquet written by graft.tools.ProfileTextScale."""
import sys, time
import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graftscale/docs_x50"
con = duckdb.connect()
con.execute("PRAGMA threads=32")
rel = f"read_parquet('{d}/*.parquet')"

MINHASH = f"""
WITH shingles AS (
  SELECT doc_id, substr(text, CAST(i AS INTEGER), 5) AS sh
  FROM {rel}, UNNEST(range(1, length(text) - 3)) AS t(i)
  WHERE length(text) >= 5)
SELECT COUNT(*) FROM (
  SELECT doc_id, CAST(seed AS INTEGER) AS seed,
    MIN(substr(md5(sh), CAST(4 * seed + 1 AS INTEGER))
        || substr(md5(sh), 1, CAST(4 * seed AS INTEGER))) AS sig
  FROM shingles, UNNEST(range(0, 8)) AS s(seed)
  GROUP BY doc_id, seed)
"""

SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM {rel}),
bits AS (
  SELECT doc_id, CAST(i AS INTEGER) AS i,
    ((strpos('0123456789abcdef', substr(md5(tok), CAST(i // 4 AS INTEGER) + 1, 1)) - 1)
      >> CAST(i % 4 AS INTEGER)) & 1 AS bit
  FROM toks, UNNEST(range(0, 32)) AS t(i)),
votes AS (SELECT doc_id, i, SUM(bit * 2 - 1) AS w FROM bits GROUP BY doc_id, i)
SELECT COUNT(*) FROM (
  SELECT doc_id,
    CAST(SUM(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS sh
  FROM votes GROUP BY doc_id)
"""

HEAVY = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
  FROM {rel}),
tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT COUNT(*) FROM (
  SELECT token FROM toks, tot GROUP BY token, tot.n
  HAVING COUNT(*) * 256 > tot.n)
"""

CONTAM = f"""
WITH wl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
  FROM {rel}),
grams AS (
  SELECT DISTINCT doc_id,
    md5(array_to_string(w[CAST(i AS INTEGER):CAST(i AS INTEGER) + 2], ' ')) AS h
  FROM wl, UNNEST(range(1, len(w) - 1)) AS r(i)),
ov AS (
  SELECT doc_id, COUNT(*) AS n_overlap FROM grams
  WHERE doc_id % 40 != 0
    AND h IN (SELECT h FROM grams WHERE doc_id % 40 = 0)
  GROUP BY doc_id)
SELECT COUNT(*) FROM (
  SELECT d.doc_id FROM (SELECT doc_id FROM {rel} WHERE doc_id % 40 != 0) d
  LEFT JOIN ov ON ov.doc_id = d.doc_id)
"""

for name, sql in [("minhash_sigs", MINHASH), ("simhash32", SIMHASH),
                  ("heavy_hitters", HEAVY), ("contamination_scale", CONTAM)]:
    t0 = time.time()
    rows = con.execute(sql).fetchone()[0]
    print(f"{name:22s} {time.time() - t0:7.2f} s  rows={rows}")
