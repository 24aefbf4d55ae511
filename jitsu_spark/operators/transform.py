"""User-function event transformation: 1 event -> 0..N events (+ dead letter).

Reference semantics: the JS-transformation stage DESIGNED in
/root/reference/design-docs/transformations.md:1-60 (not implemented there
either) — a user function receives one event and returns nothing (drop),
one event, or several events (fan-out), replacing mapping rules and
table-name templates with a Turing-complete seam. Re-derived, no code
ported; the contract below is the PySpark-native equivalent of that
design's ``transform(event) -> null | event | event[]``.

Spark-first re-expression:

- the stage is ONE ``mapInPandas`` over Arrow batches — the engine never
  sees per-row Python; only the user's own per-event function runs per
  row, exactly as the reference design's per-event JS would;
- for hot-path transforms prefer ``transform_events_vectorized``: the
  user function takes and returns a whole pandas DataFrame per Arrow
  batch (0..N output rows), keeping the user code vectorized too;
- a raising event never crashes the stream: it is emitted on an inline
  dead-letter surface (``_error`` traceback + ``_raw`` input JSON) that
  ``split_dead_letter`` separates from the good rows — the same
  fallback-file posture as the reference's dead-letter path
  (SURVEY.md W11);
- fan-out preserves exactly-once through the normal commit-manifest
  machinery: the stage is deterministic given the input batch, so a
  replayed micro-batch regenerates the identical fan-out and merge_batch
  skips it by (job_id, batch_id).

Output-key contract: when fanning out, the user function must assign each
emitted event a deterministic unique merge key (e.g. md5(parent_id + i));
uuid()-style keys would break replay idempotence (SURVEY.md §7.4).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ERROR_COL = "_error"
RAW_COL = "_raw"


def _json_default(o):
    """Lossless-enough JSON for the _raw dead-letter payload: numpy
    scalars/arrays to native lists (str() would stringify token arrays,
    making them unrecoverable), datetimes to ISO strings that
    ``from_json`` parses back."""
    if hasattr(o, "tolist"):
        return o.tolist()
    if hasattr(o, "isoformat"):
        return o.isoformat()
    return str(o)


def _full_schema(out_schema: T.StructType) -> T.StructType:
    names = {f.name for f in out_schema.fields}
    if {ERROR_COL, RAW_COL} & names:
        raise ValueError(
            f"output schema must not contain reserved columns "
            f"{ERROR_COL!r}/{RAW_COL!r}"
        )
    return T.StructType(
        list(out_schema.fields)
        + [
            T.StructField(ERROR_COL, T.StringType()),
            T.StructField(RAW_COL, T.StringType()),
        ]
    )


def transform_events(
    df: DataFrame,
    fn: Callable[[dict], None | dict | list[dict]],
    output_schema: T.StructType | None = None,
) -> DataFrame:
    """Apply a per-event user function with 0..N-row output and an inline
    dead-letter surface.

    ``fn(event: dict)`` returns ``None`` (drop), a dict (1->1), or a list
    of dicts (fan-out). Missing output fields become NULL. A raising event
    is captured as a dead-letter row. Returns the combined frame; use
    :func:`split_dead_letter` to separate good rows from dead letters.
    """
    out_schema = output_schema or df.schema
    full = _full_schema(out_schema)
    out_names = [f.name for f in out_schema.fields]
    all_names = out_names + [ERROR_COL, RAW_COL]

    def run(batches: Iterable):
        import json
        import traceback

        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for rec in pdf.to_dict(orient="records"):
                try:
                    res = fn(rec)
                except Exception:
                    dead = {c: None for c in out_names}
                    dead[ERROR_COL] = traceback.format_exc(limit=5)
                    dead[RAW_COL] = json.dumps(rec, default=_json_default, sort_keys=True)
                    rows.append(dead)
                    continue
                if res is None:
                    continue
                events = res if isinstance(res, list) else [res]
                for ev in events:
                    out = {c: ev.get(c) for c in out_names}
                    out[ERROR_COL] = None
                    out[RAW_COL] = None
                    rows.append(out)
            if rows:
                yield pd.DataFrame(rows, columns=all_names)

    return df.mapInPandas(run, full)


def transform_events_vectorized(
    df: DataFrame,
    fn: Callable,
    output_schema: T.StructType | None = None,
) -> DataFrame:
    """Vectorized variant: ``fn(pdf: pandas.DataFrame) -> pandas.DataFrame``
    per Arrow batch (any row count — drop/fan-out by returning fewer/more
    rows). A raising BATCH dead-letters every event in it (the vectorized
    contract cannot attribute the error to one row). Prefer this on hot
    paths; same output surface as :func:`transform_events`."""
    out_schema = output_schema or df.schema
    full = _full_schema(out_schema)
    out_names = [f.name for f in out_schema.fields]
    all_names = out_names + [ERROR_COL, RAW_COL]

    def run(batches: Iterable):
        import json
        import traceback

        import pandas as pd

        for pdf in batches:
            try:
                out = fn(pdf.copy())
            except Exception:
                err = traceback.format_exc(limit=5)
                dead = pd.DataFrame(
                    {
                        **{c: [None] * len(pdf) for c in out_names},
                        ERROR_COL: [err] * len(pdf),
                        RAW_COL: [
                            json.dumps(r, default=_json_default, sort_keys=True)
                            for r in pdf.to_dict(orient="records")
                        ],
                    },
                    columns=all_names,
                )
                yield dead
                continue
            if out is None or len(out) == 0:
                continue
            res = pd.DataFrame(
                {
                    **{
                        c: (out[c] if c in out.columns else [None] * len(out))
                        for c in out_names
                    },
                    ERROR_COL: [None] * len(out),
                    RAW_COL: [None] * len(out),
                },
                columns=all_names,
            )
            yield res

    return df.mapInPandas(run, full)


def split_dead_letter(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_surface_cols, dead_letter_rows)."""
    good = df.filter(F.col(ERROR_COL).isNull()).drop(ERROR_COL, RAW_COL)
    dead = df.filter(F.col(ERROR_COL).isNotNull())
    return good, dead


def replay_dead_letters(
    spark,
    dead_letter_dir: str,
    input_schema: T.StructType,
    fn: Callable[[dict], None | dict | list[dict]] | None = None,
    output_schema: T.StructType | None = None,
) -> DataFrame:
    """Reconstruct the original events from a CdcStreamJob dead-letter dir
    (the ``_raw`` input JSON captured at failure time) and optionally
    re-run them through a FIXED transform — the engine's analog of the
    reference replaying fallback files back through the pipeline
    (SURVEY.md W11). Without ``fn`` returns the recovered input events;
    with ``fn`` returns the combined transform surface (split it with
    :func:`split_dead_letter` — still-failing events dead-letter again)."""
    raw = spark.read.option("recursiveFileLookup", "true").parquet(
        dead_letter_dir
    )
    events = raw.select(
        F.from_json(F.col(RAW_COL), input_schema).alias("_e")
    ).select("_e.*")
    if fn is None:
        return events
    return transform_events(events, fn, output_schema or input_schema)
