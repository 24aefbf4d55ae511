"""PII detection and redaction for training-data pipelines.

A pretrain corpus build scrubs personally-identifiable strings before
packing; the standard first pass is regex families (emails, IPv4s, phone
numbers, card-like digit runs) applied in a fixed order, each replaced
by a typed placeholder token so downstream tokenization sees a stable
vocabulary item instead of the raw value.

Engine shape: pure ``regexp_count``/``regexp_replace`` column
expressions — JVM-side, codegen-fused, zero shuffle, column-pruned to
(id, text). The patterns deliberately use only the regex subset shared
by Java's engine and RE2 (no lookaround, no backreferences) so the
DuckDB oracle replays the scrub byte-for-byte; a production deployment
would extend the rule list (names/addresses need a model pass — that
slots in as a mapInPandas stage exactly like multimodal/binary.py).

Counting happens on the text state each rule actually sees (after the
previous rules' replacements), so overlapping families (a card-like run
inside an already-redacted phone) are never double-counted — the scrub
is a deterministic left-to-right fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ordered (name, pattern, replacement) — order is part of the contract:
#: emails first (their domains can contain digit runs), then dotted IPv4,
#: then dashed phones, then bare 13-16 digit card-like runs
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("card", r"\b\d{13,16}\b", "<CARD>"),
)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = PII_RULES,
    out_col: str = "clean_text",
) -> DataFrame:
    """Redact PII in ``text_col`` into ``out_col`` and stamp per-family
    match counts (``n_<name>``) plus ``pii_total``."""
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pat, repl in rules:
        # NULL text (e.g. a CDC delete envelope flowing through the
        # scrub) must count 0, not propagate NULL into pii_total
        counts.append(
            F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    out = df.select(
        "*",
        *counts,
        cur.alias(out_col),
    )
    total_col = sum(
        (F.col(f"n_{name}") for name, _, _ in rules), F.lit(0)
    ).cast("long")
    return out.withColumn("pii_total", total_col)
