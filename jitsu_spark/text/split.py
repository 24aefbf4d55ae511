"""Deterministic train/validation/test corpus split.

Every document lands in exactly one split, decided by the same
md5-derived uniform as the mixture sampler (text/mixing.py) — no RNG, no
driver state, stable under repartitioning and reruns, and replayable in
plain SQL. Cumulative-fraction assignment: u < f_train → train;
u < f_train + f_val → val; else test.

Scale shape: one narrow projection, zero shuffle; composes with any
downstream repartition/groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jitsu_spark.text.mixing import _uniform


def split_corpus(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Stamp ``split_col`` per the cumulative ``fractions`` (ordered dict
    of name → fraction; must sum to 1 within 1e-9; the LAST split absorbs
    the remainder so float edges cannot drop a document)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("split fractions must be non-negative")
    names = list(fractions)
    u = _uniform(id_col, seed, salt="split:")  # independent of mixture/shard streams
    # whens nest outside-in: fold in reverse cutoff order so the SMALLEST
    # cumulative cutoff is checked first; the last split absorbs u >= max
    cums: list[tuple[str, float]] = []
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cums.append((name, cum))
    expr = F.lit(names[-1])
    for name, c in reversed(cums):
        expr = F.when(u < F.lit(c), F.lit(name)).otherwise(expr)
    return docs.withColumn(split_col, expr)
