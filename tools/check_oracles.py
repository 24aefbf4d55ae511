"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at the same sf_dir,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from jitsu_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows (no oracle)")
            continue
        orel = con.sql(oracles[name])
        orows = orel.fetchall()
        ocols = list(orel.columns)
        ok_cols = sorted(scols) == sorted(ocols)
        # The driver's value hash is sensitive to declared decimal
        # (precision, scale) — Spark decimal(28,2) vs DuckDB DECIMAL(38,2)
        # hash-mismatches even when every value is equal (r1 lesson:
        # events_per_hour/pricing_summary/revenue_by_nation). Replicate that
        # strictness: any decimal column must declare the same (p, s) on
        # both sides.
        sdec = {
            f.name: f.dataType.simpleString().upper()
            for f in sdf.schema.fields
            if f.dataType.simpleString().startswith("decimal")
        }
        odec = {
            c: str(t).upper().replace(" ", "")
            for c, t in zip(orel.columns, orel.types)
            if str(t).upper().startswith("DECIMAL")
        }
        dec_mismatch = {
            c: (sdec.get(c), odec.get(c))
            for c in set(sdec) | set(odec)
            if sdec.get(c) != odec.get(c)
        }
        ok_n = len(srows) == len(orows)
        sh = value_hash(srows, scols)
        oh = value_hash(orows, ocols)
        ok_h = sh == oh
        ok_dec = not dec_mismatch
        status = "OK " if (ok_cols and ok_n and ok_h and ok_dec) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:28s} {status} rows={len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} hash={'=' if ok_h else f'{sh} vs {oh}'}"
            + ("" if ok_dec else f" decimal_mismatch={dec_mismatch}")
        )
        if not ok_h and ok_cols and ok_n:
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("|".join(_norm(r[i]) for i in order) for r in srows)
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            oset = sorted("|".join(_norm(r[i]) for i in oorder) for r in orows)
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            for a, b in diffs:
                print(f"    spark:  {a[:150]}")
                print(f"    oracle: {b[:150]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
