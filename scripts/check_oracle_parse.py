#!/usr/bin/env python3
"""Dev/CI oracle PARSE gate: every oracle SQL string must parse AND
bind in DuckDB (EXPLAIN — no execution) against the sf tables.

Exists because round 6 landed a query whose oracle named a CTE `glob`
(a DuckDB keyword): the SQL had never been fed to DuckDB before the
driver's gate, so the breakage shipped. This script is the cheap
pre-landing half of scripts/check_oracle.py.

Usage: python3 scripts/check_oracle_parse.py <sfDir> <sqlDir>
where <sqlDir> holds one <query_name>.sql file per oracle.
"""
import glob
import os
import sys

import duckdb

sfdir, sqldir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

files = sorted(glob.glob(f"{sqldir}/*.sql"))
bad = []
for f in files:
    name = os.path.basename(f)[:-4]
    with open(f) as fh:
        sql = fh.read()
    try:
        con.execute("EXPLAIN " + sql)
    except Exception as e:  # noqa: BLE001
        bad.append((name, str(e).splitlines()[0]))

if bad:
    for n, e in bad:
        print(f"PARSEFAIL {n}: {e}")
    sys.exit(1)
print(f"all {len(files)} oracle SQL strings parse+bind in DuckDB")
