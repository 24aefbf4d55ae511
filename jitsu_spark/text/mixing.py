"""Domain-mixture sampling ("data mixing") for training-corpus assembly.

Published LM training recipes weight domains independently of their raw
size (e.g. The Pile / LLaMA mixture tables: a domain with weight w < 1
is down-sampled to a w fraction; w > 1 is up-sampled — documents repeat
across epochs). This operator materializes such a mixture
deterministically:

- w < 1: keep a document iff its md5-derived uniform u(doc) < w;
- w >= 1: emit floor(w) full copies, plus one more iff u(doc) < frac(w)
  (so the EXPECTED multiplicity is exactly w and the realized count per
  doc is deterministic, reproducible across runs and partitionings);
- each emitted row carries ``copy_no`` (0-based) so downstream packing /
  shuffling can seed per-copy variation.

Scale shape: one narrow projection computes u per row (md5 — no RNG, no
driver state, independent of partitioning); up-sampling uses
explode(sequence(...)), so a w=3.2 domain grows only ITS rows — there is
no shuffle at all, and the operator composes with any downstream
repartition. Everything is plain SQL, so a DuckDB oracle replays the
mixture bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _uniform(id_col: str, seed: int, salt: str = "mix:") -> F.Column:
    """md5-derived u in [0, 1): first 8 hex chars / 16^8. Matches
    DuckDB's ('0x' || substr(md5(...), 1, 8))::BIGINT / 4294967296.0.

    ``salt`` namespaces the hash stream PER OPERATOR: without it, a
    mixture at seed s and a split/shard at the same seed would reuse the
    identical u per doc — sampling decisions 100% correlated (e.g. a
    w=0.4 down-sampled domain could land entirely in a 0.9 train split's
    prefix, leaving val/test without that domain)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#", F.lit(f"{salt}{seed}"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(1 << 32))


def sample_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    domain_col: str = "source",
    default_weight: float = 1.0,
    seed: int = 0,
    copy_col: str = "copy_no",
) -> DataFrame:
    """Materialize a weighted domain mixture. Returns the input columns
    plus ``copy_col``; a doc from a domain with weight w appears
    floor(w) or ceil(w) times (expected w), and 0 or 1 times for w < 1."""
    for d, w in weights.items():
        if w < 0:
            raise ValueError(f"negative mixture weight for {d!r}: {w}")
    if "_n_copies" in docs.columns:
        raise ValueError(
            "input already has a column named '_n_copies' (engine-internal)"
        )
    u = _uniform(id_col, seed)
    wcol = F.lit(float(default_weight))
    for d, w in weights.items():
        wcol = F.when(F.col(domain_col) == d, F.lit(float(w))).otherwise(wcol)
    # n_copies = floor(w) + (u < frac(w)); for w<1 this is 0 or 1
    n_copies = (
        F.floor(wcol) + F.when(u < wcol - F.floor(wcol), 1).otherwise(0)
    ).cast("int")
    out = docs.withColumn("_n_copies", n_copies).filter(F.col("_n_copies") > 0)
    return out.withColumn(
        copy_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
    ).drop("_n_copies")


def mixture_stats(mixed: DataFrame, domain_col: str = "source") -> DataFrame:
    """Realized mixture: rows per domain and its fraction of the corpus —
    the audit table to compare against the target weights. The window is
    over the (tiny) per-domain aggregate, not the corpus."""
    from pyspark.sql.window import Window

    agg = mixed.groupBy(domain_col).agg(F.count("*").alias("n_rows"))
    return agg.withColumn(
        "frac", F.col("n_rows") / F.sum("n_rows").over(Window.partitionBy())
    )


def expected_multiplicity(weight: float) -> tuple[int, float]:
    """(floor(w), frac(w)) — the deterministic copy rule, exposed for
    tests and documentation."""
    fl = math.floor(weight)
    return int(fl), weight - fl
