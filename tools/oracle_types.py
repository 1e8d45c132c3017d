#!/usr/bin/env python3
"""Sweep every oracle SQL for result column types that do not survive the
driver's pandas-side conversion (dev tool only; runs on the driver-side
duckdb, not in the engine).

DuckDB widens several expressions beyond what pandas can hold losslessly:
windowed/plain sum(BIGINT) -> HUGEINT (int128), integer products can be
HUGEINT, and DECIMAL arithmetic stays DECIMAL. pandas renders HUGEINT and
DECIMAL as float64 / object, so a Spark BIGINT 0 hashes differently from
the oracle's 0.0 even when values agree. This tool prepares (LIMIT 0)
each oracle query and flags any HUGEINT/DECIMAL result column, and also
diffs the oracle dtype against the Spark parquet dtype for the same
column name.

Usage: python3 tools/oracle_types.py <sfDir> <outDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

RISKY = ("HUGEINT", "DECIMAL", "UHUGEINT")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_flag = 0
    for name, sql in sorted(oracle.items()):
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        otypes = {c.lower(): str(t) for c, t in zip(rel.columns, rel.types)}
        srel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0")
        stypes = {c.lower(): str(t) for c, t in zip(srel.columns, srel.types)}
        for c, ty in sorted(otypes.items()):
            if any(r in ty.upper() for r in RISKY):
                print(f"FLAG {name}.{c}: oracle {ty} "
                      f"(spark {stypes.get(c, '<missing>')})")
                n_flag += 1
            elif c in stypes and stypes[c] != ty:
                # informational: lossless pairs (e.g. INT vs BIGINT) are
                # fine because both canonicalise to the same int string
                print(f"note {name}.{c}: oracle {ty} vs spark {stypes[c]}")
    print(f"\n{n_flag} risky column(s)")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
