#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs SparkEntry.oracleSql, mimicking the
driver's DuckDB compare: for each query, load the Spark parquet output and the
DuckDB oracle result, sort columns by name, sort rows, compare values (doubles
to 9 significant digits). Dev tool only — not part of the shipped library.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return float(f"{v:.9g}")
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    qnames = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in qnames:
        ds = pads.dataset(f"{out_dir}/{name}")
        tbl = ds.to_table()
        s_cols = tbl.column_names
        s_rows = [tuple(row[c] for c in s_cols) for row in tbl.to_pylist()]
        if name not in oracles:
            print(f"  ~ {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        oc, orows = norm_rows(o_cols, o_rows)
        if sc != oc:
            print(f"  ✗ {name}: column mismatch spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orows):
            print(f"  ✗ {name}: row count spark={len(sr)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, orows) if a != b]
        if bad:
            print(f"  ✗ {name}: {len(bad)}/{len(sr)} row mismatches; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"  ✓ {name}: {len(sr)} rows match")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
