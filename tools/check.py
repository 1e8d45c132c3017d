#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only; the
shipped engine is Scala — see Verify.scala).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
  python3 tools/check.py <sfDir> <outDir>

Registers each testdata parquet as a DuckDB view by table name, executes
every oracle_sql.json entry, and compares to the Spark-produced parquet:
column names (sorted), row count, and exact value-hash over rows sorted
by all columns.

Both sides are fetched THROUGH PANDAS (.df()) to mirror the driver's
comparator: DuckDB HUGEINT/DECIMAL results become float64 there, so an
un-CAST oracle aggregate that disagrees with Spark's BIGINT fails here
too (fetchall()'s Python ints used to hide exactly that — round 4's
n38/n40).

Known pandas collapses this mirror inherits (deliberately — matching
the driver matters more than maximal strictness): NULL and NaN both
canonicalize to 'NaN' in float columns, and nullable int columns
compare as float64 (exact only below 2^53). Queries must therefore
not rely on a NULL-vs-NaN distinction in numeric outputs; none do.
"""
import json
import math
import sys

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_canon(df, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = list(df.itertuples(index=False, name=None))
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got_rel.columns]
            got = table_canon(got_rel.df(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = table_canon(exp_rel.df(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif got != exp:
            diff = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
            i = diff[0]
            print(f"FAIL {name}: values differ at {len(diff)}/{len(got)} "
                  f"rows; first row {i}:\n  got {got[i]}\n  exp {exp[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
