#!/usr/bin/env python3
"""Dev-only oracle checker mirroring the driver's t2 gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same sf tables, sorts columns by name, and compares cell values.
"""
import json
import math
import sys

import duckdb
import pyarrow as pa


def family(t):
    """Arrow type FAMILY, mirroring the driver's typed hash: empirically
    the driver is WIDTH-insensitive (int32 vs int64 hashes green — r04
    q53/q62) but FAMILY-sensitive (decimal vs int hashes red — r04's 11
    fails), and naive vs tz-aware timestamps differ."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return ("timestamp", t.tz is not None)
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", family(t.value_type))
    return str(t)

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetch_arrow_table()
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).fetch_arrow_table()
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            fails.append((name, f"columns differ: oracle={wcols} spark={gcols}"))
            continue
        if want.num_rows != got.num_rows:
            fails.append((name, f"rows differ: oracle={want.num_rows} spark={got.num_rows}"))
            continue
        # The driver hashes TYPED output: a DuckDB DECIMAL(38,0)/HUGEINT vs a
        # Spark BIGINT is a hash mismatch even when every value compares equal
        # in Python (1.0 == Decimal(1)). Compare type FAMILIES (see family())
        # — both sides come through DuckDB's fetch_arrow_table, so types
        # share one Arrow space.
        tbad = None
        for c in wcols:
            wt = want.schema.field(c).type
            gt = got.schema.field(c).type
            if family(wt) != family(gt):
                tbad = f"col {c} TYPE family differs: oracle={wt} spark={gt}"
                break
        if tbad:
            fails.append((name, tbad))
            continue
        bad = None
        for c in wcols:
            wv, gv = want.column(c).to_pylist(), got.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                eq = (a == b) or (a is None and b is None) or (
                    isinstance(a, float) and isinstance(b, float)
                    and (a == b or (math.isnan(a) and math.isnan(b))))
                if not eq:
                    bad = f"col {c} row {i}: oracle={a!r} spark={b!r}"
                    break
            if bad:
                break
        if bad:
            fails.append((name, bad))
        else:
            print(f"  OK   {name} ({want.num_rows} rows)")
    except Exception as e:  # noqa: BLE001
        fails.append((name, f"error: {e}"))

# rows-only queries (no oracle): check the parquet exists and is non-empty
import glob, os  # noqa: E402
for p in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(p.rstrip("/"))
    if name in oracle:
        continue
    try:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{p}*.parquet')").fetchone()[0]
        print(f"  OK*  {name} ({n} rows, rows-only)" if n > 0
              else f"  WARN {name} EMPTY (rows-only)")
    except Exception as e:  # noqa: BLE001
        fails.append((name, f"error: {e}"))

print()
if fails:
    for name, why in fails:
        print(f"  FAIL {name}: {why}")
    sys.exit(1)
print(f"all {len(oracle)} oracle-checked queries match")
