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
import os
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
    """Lossy float normalization (roughly what a forgiving harness does)."""
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


def _norm_strict(v):
    """Exact-representation normalization (type-tagged, no squashing).

    The r1+r2 lesson: the driver's harness is representation-sensitive in
    ways a lossy replica hides (Decimal trailing zeros, float repr). A pass
    must mean representation-PROOF, so this side tags types and keeps the
    canonical string of every value.
    """
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"  # keeps trailing zeros — '123.40' != '123.4'
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, dt.datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_strict(x) for x in v) + "]"
    return f"s:{v}"


def value_hash(rows: list[tuple], colnames: list[str], norm=_norm) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


#: Result-surface types the driver's pandas-based hasher materializes
#: asymmetrically (DECIMAL) or cannot hash at all (ARRAY/MAP/STRUCT).
#: Any entry query exposing one of these is a gate risk regardless of
#: whether the local hashes happen to agree.
_GATE_UNSAFE_SPARK = ("decimal", "array", "map", "struct")


def gate_unsafe_cols(sdf, orel) -> dict[str, str]:
    bad: dict[str, str] = {}
    for f in sdf.schema.fields:
        t = f.dataType.simpleString()
        if t.startswith(_GATE_UNSAFE_SPARK):
            bad[f.name] = f"spark:{t}"
    for c, t in zip(orel.columns, orel.types):
        ts = str(t).upper()
        # HUGEINT (DuckDB's sum(BIGINT) result) materializes as float64
        # through the driver's pandas hasher while Spark emits int64 —
        # the exact r3 failure mode (incremental_agg / lsh_bucket_guard).
        if (
            ts.startswith(("DECIMAL", "STRUCT", "MAP", "HUGEINT", "UHUGEINT"))
            or "[]" in ts
        ):
            bad[c] = (bad.get(c, "") + f" duckdb:{ts}").strip()
    return bad


def pandas_rows(df) -> list[tuple]:
    """Materialize a result exactly as the driver does: through pandas.

    DuckDB fetchall() gives HUGEINT as Python int (hashes agree with
    Spark int64) but the driver converts via .df()/toPandas() where
    HUGEINT and nullable ints become float64 — so local agreement on
    fetchall() does NOT imply driver agreement. This path replicates the
    driver's materialization so it does.
    """
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(v.item() if hasattr(v, "item") else v for v in row))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: directory of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
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
        # Strictness rule 1: no gate-unsafe result-surface types, period.
        # The driver failed DECIMAL (hash asymmetry) and ARRAY (hard error)
        # columns in r1 AND r2 while this replica passed them — so the
        # replica now refuses those dtypes outright rather than trusting
        # any local hash agreement.
        unsafe = gate_unsafe_cols(sdf, orel)
        # Strictness rule 2: values must agree under TWO independent
        # normalizations — lossy float (forgiving) and exact type-tagged
        # string (representation-proof). Both must match.
        ok_n = len(srows) == len(orows)
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        shs = value_hash(srows, scols, _norm_strict)
        ohs = value_hash(orows, ocols, _norm_strict)
        ok_h = sh == oh
        ok_hs = shs == ohs
        # Strictness rule 3: hash BOTH sides through pandas (the driver's
        # actual materialization path) — catches dtype drift (HUGEINT /
        # nullable-int → float64) that fetchall()/collect() hide.
        sprows = pandas_rows(sdf.toPandas())
        oprows = pandas_rows(con.sql(oracles[name]).df())
        shp = value_hash(sprows, scols, _norm_strict)
        ohp = value_hash(oprows, ocols, _norm_strict)
        ok_hp = shp == ohp
        ok = ok_cols and ok_n and ok_h and ok_hs and ok_hp and not unsafe
        status = "OK " if ok else "FAIL"
        if not ok:
            failures += 1
        print(
            f"{name:28s} {status} rows={len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} "
            f"hash={'=' if ok_h else f'{sh} vs {oh}'} "
            f"strict={'=' if ok_hs else f'{shs} vs {ohs}'} "
            f"pandas={'=' if ok_hp else f'{shp} vs {ohp}'}"
            + ("" if not unsafe else f" GATE-UNSAFE-COLS={unsafe}")
        )
        if (not ok_h or not ok_hs or not ok_hp) and ok_cols and ok_n:
            norm = _norm if not ok_h else _norm_strict
            dsrows, dorows = srows, orows
            if ok_h and ok_hs:  # only the pandas path diverged
                dsrows, dorows = sprows, oprows
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("|".join(norm(r[i]) for i in order) for r in dsrows)
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            oset = sorted("|".join(norm(r[i]) for i in oorder) for r in dorows)
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            for a, b in diffs:
                print(f"    spark:  {a[:150]}")
                print(f"    oracle: {b[:150]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
