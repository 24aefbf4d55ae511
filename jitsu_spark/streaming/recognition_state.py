"""Stateful-streaming user recognition (ST8) via applyInPandasWithState.

Alternative to the pending-table design in recognition.py — the SAME
retrospective semantics (park anonymous events until an identify event
maps their anon_id, then emit them completed), but the keyed state lives
in Spark's streaming state store instead of lake tables:

- group the stream by anon_id;
- state per anon_id = (resolved user_id | NULL, parked event rows);
- an identify event resolves the mapping (LWW by seq), flushes parked
  events completed, and keeps the mapping for future batches;
- events with no anon_id (identified or unkeyed) pass straight through —
  the NULL group carries no state.

Trade-offs vs the pending-table variant (both are kept, per-deployment
choice): the state store gives lower latency (no per-batch lake merges
for park/unpark) and transparent checkpointing, while the pending-table
keeps parked events queryable with SQL and survives checkpoint deletion.
State is bounded by the unidentified backlog, exactly like the
reference's TTL'd Redis keys (server/users/service.go:90-265 semantics —
re-derived); wire ``GroupStateTimeout`` for an eviction TTL if needed.

The emitted stream is merged into the destination by the normal
``merge_batch`` foreachBatch sink, so exactly-once still comes from the
commit manifest; the state store replays deterministically from the
checkpoint (Arrow-batched pandas state function — never per-row Python
over the stream, the per-group pandas work touches only that group's
rows)."""

from __future__ import annotations

from io import StringIO

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _state_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("resolved", T.StringType()),
            T.StructField("parked", T.ArrayType(T.StringType())),
        ]
    )


def recognize_with_state(
    stream_df: DataFrame,
    anon_col: str = "anon_id",
    user_col: str = "user_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply retrospective recognition to a streaming DataFrame of CDC
    envelopes; returns the stream of destination-ready events (anonymous
    events appear only once identified). Output schema == input schema."""
    out_schema = stream_df.schema
    out_cols = [f.name for f in out_schema.fields]
    ts_cols = [
        f.name
        for f in out_schema.fields
        if isinstance(f.dataType, T.TimestampType)
    ]
    # Pin pandas dtypes for the JSON unpark: without them read_json
    # re-infers types, so a StringType id like '007' comes back as int 7
    # (corrupting the merge key) and nullable longs come back float64+NaN
    # (breaking Arrow conversion against the output schema).
    unpark_dtypes = {}
    for f in out_schema.fields:
        if isinstance(f.dataType, T.StringType):
            unpark_dtypes[f.name] = "object"
        elif isinstance(
            f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            unpark_dtypes[f.name] = "Int64"  # nullable int, Arrow-safe
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            unpark_dtypes[f.name] = "float64"
        elif isinstance(f.dataType, T.BooleanType):
            unpark_dtypes[f.name] = "boolean"

    def fn(key, pdfs, state):
        resolved, parked = (state.get if state.exists else (None, []))
        parked = list(parked or [])
        anon = key[0]
        chunks = [pdf for pdf in pdfs]
        rows = pd.concat(chunks) if chunks else pd.DataFrame(columns=out_cols)
        if anon is None:
            # identified or unkeyed events: stateless passthrough
            yield rows[out_cols]
            return
        rows = rows.sort_values(seq_col)
        ids = rows[rows[user_col].notna()]
        if len(ids):
            resolved = ids.iloc[-1][user_col]  # LWW by seq
        out = []
        if resolved is not None:
            if parked:
                unparked = pd.read_json(
                    StringIO("\n".join(parked)), lines=True,
                    convert_dates=ts_cols or False,
                    dtype=unpark_dtypes,
                )
                unparked[user_col] = resolved
                out.append(unparked[out_cols])
                parked = []
            completed = rows.copy()
            completed[user_col] = completed[user_col].where(
                completed[user_col].notna(), resolved
            )
            out.append(completed[out_cols])
        else:
            # park as JSON-lines strings (state schema stays payload-agnostic)
            parked.extend(
                rows.to_json(
                    orient="records", date_format="iso", lines=True
                ).splitlines()
            )
        state.update((resolved, parked))
        for chunk in out:
            yield chunk

    return (
        stream_df.groupBy(F.col(anon_col))
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_state_schema(),
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
