"""Single-threaded pure-Python dict-replay oracle (FIXTURES.md §6).

Applies the change log in strict ``seq`` order to a {key: row} dict — the
reference's upsert semantics in a few lines — and compares the Spark
engine's final table state against it row-for-row under token-array
equality. Used only at test scales (the oracle collects to the driver).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame


def dict_replay(
    rows: list[dict], key: str = "doc_id", seq_col: str = "seq", op_col: str = "op"
) -> dict[Any, dict]:
    state: dict[Any, dict] = {}
    for r in sorted(rows, key=lambda r: r[seq_col]):
        k = r[key]
        if r[op_col] == "d":
            state.pop(k, None)
        else:
            state[k] = {c: v for c, v in r.items() if c not in (seq_col, op_col)}
    return state


def _eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


def assert_matches_oracle(
    table_df: DataFrame, expected: dict[Any, dict], key: str = "doc_id"
) -> None:
    actual = {r[key]: r.asDict(recursive=True) for r in table_df.collect()}
    missing = set(expected) - set(actual)
    extra = set(actual) - set(expected)
    assert not missing and not extra, (
        f"key sets differ: missing={sorted(missing)[:5]} extra={sorted(extra)[:5]} "
        f"(n_expected={len(expected)}, n_actual={len(actual)})"
    )
    for k, exp_row in expected.items():
        act_row = actual[k]
        for c, v in exp_row.items():
            if c == key:
                continue
            assert c in act_row, f"row {k}: column {c!r} missing from table"
            assert _eq(act_row[c], v), (
                f"row {k} column {c!r}: table={act_row[c]!r} oracle={v!r}"
            )
