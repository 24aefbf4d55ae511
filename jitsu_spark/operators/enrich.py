"""Context enrichment (P1/P2/P13/P14 in SURVEY.md §2.2).

Per-event stamps the reference applies at intake (semantics per
/root/reference/server/enrichment/context_enrichment_step.go:17-49 and
events/enricher.go:19-56 — re-derived):

- ``event_id``: keep an existing id, else derive one. In the streaming
  path ids must be DETERMINISTIC (foreachBatch replays would mint new
  uuids), so the default is the source-sync style md5 of the sorted
  payload values (ref uuid.GetKeysHash semantics) — ``uuid()`` is only
  for interactive/batch intake, opt-in.
- ``_timestamp``: event receive time (ISO micros in the reference).
- ``api_key`` / ``src`` stamps, conditional on src != 'api' (P13).

All pure built-ins; one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_deterministic_event_id(
    df: DataFrame,
    out_col: str = "event_id",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """``md5(concat_ws('|', <sorted columns>))`` — stable across replays.
    Columns are sorted by name so the id does not depend on projection
    order (matching the reference's sorted-keys hash contract)."""
    cols = sorted(id_cols or [c for c in df.columns if c != out_col])
    fingerprint = F.md5(
        F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols])
    )
    if out_col in df.columns:
        return df.withColumn(out_col, F.coalesce(F.col(out_col), fingerprint))
    return df.withColumn(out_col, fingerprint)


def with_context_enrichment(
    df: DataFrame,
    api_key: str | None = None,
    src: str | None = None,
    timestamp_col: str = "_timestamp",
    event_time: Column | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Full intake enrichment: event_id + _timestamp + api_key/src stamps.

    ``event_time`` defaults to ``current_timestamp()`` (live intake); pass
    an expression over the log (e.g. ``F.col('ts')``) for deterministic
    replay."""
    out = with_deterministic_event_id(df, id_cols=id_cols)
    out = out.withColumn(
        timestamp_col, event_time if event_time is not None else F.current_timestamp()
    )
    if api_key is not None:
        out = out.withColumn("api_key", F.lit(api_key))
    if src is not None:
        if "src" in out.columns:
            # conditional enrichment: do not overwrite api-tagged events (P13)
            out = out.withColumn(
                "src",
                F.when(F.col("src") == "api", F.col("src")).otherwise(F.lit(src)),
            )
        else:
            out = out.withColumn("src", F.lit(src))
    return out
