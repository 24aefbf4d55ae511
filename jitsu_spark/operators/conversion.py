"""Conversion-sink payload templating (W10 analog) + spool sink.

The reference's GA / Facebook "storages" are stateless per-event payload
TEMPLATERS in front of an HTTP client. The templating is pure data
transformation and belongs in the engine (columnar, oracle-checkable);
the socket is an external side effect this sandbox cannot exercise, so
the side-effect boundary is a spool directory of ready-to-send payload
lines (idempotent per batch) that any httpd/relay drains — the same
split the reference makes between payload construction and client.Send.

Reference semantics (re-derived, no code ported):
- GA Measurement-Protocol payload: url-encoded key=value pairs SORTED BY
  KEY (Go url.Values.Encode sorts), plus tid=<tracking_id>, v=1, and the
  event-type field 't' mapped through a fixed alias table with 'event'
  as the default (/root/reference/server/adapters/
  google_analytics.go:26-98).
- Facebook Conversions user-data hashing: the customer-information
  fields (ph ge db ln fn ct st zp country) are sha256-hex'd; 'em' is
  hashed only when it still contains '@' (i.e. not pre-hashed)
  (/root/reference/server/adapters/facebook_conversion_api.go:40,
  258-290).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GA_EVENT_TYPE_MAPPING = {
    "pageview": "pageview",
    "screenview": "screenview",
    "event": "event",
    "conversion": "transaction",
    "transaction": "transaction",
    "item": "item",
    "social": "social",
    "exception": "exception",
    "timing": "timing",
}

FB_FIELDS_TO_HASH = ("ph", "ge", "db", "ln", "fn", "ct", "st", "zp", "country")


def ga_payload(
    df: DataFrame,
    tracking_id: str,
    fields: list[str] | None = None,
    type_col: str = "t",
    out_col: str = "ga_payload",
) -> DataFrame:
    """Append the GA collect query string built from ``fields`` (default:
    every column), sorted by key, with tid/v stamped and the event type
    aliased. Pure expressions — one projection."""
    fields = list(fields if fields is not None else df.columns)
    reserved = {"tid", "v"} & set(fields)
    if reserved:
        # a data column literally named 'tid' or 'v' would silently
        # overwrite the stamped tracking id / protocol version
        raise ValueError(
            f"ga_payload: field(s) {sorted(reserved)} collide with the "
            "reserved GA protocol keys 'tid'/'v'; rename or exclude them"
        )
    parts: dict[str, F.Column] = {
        "tid": F.lit(tracking_id),
        "v": F.lit("1"),
    }
    for c in fields:
        val = F.col(c).cast("string")
        if c == type_col:
            mapped = F.lit("event")
            for src, dst in reversed(list(GA_EVENT_TYPE_MAPPING.items())):
                mapped = F.when(val == src, F.lit(dst)).otherwise(mapped)
            val = mapped
        parts[c] = F.url_encode(val)
    pairs = [
        F.concat(F.lit(k), F.lit("="), parts[k]) for k in sorted(parts)
    ]
    return df.withColumn(out_col, F.concat_ws("&", *pairs))


def fb_hash_user_data(
    df: DataFrame, prefix: str = "ud_", email_col: str | None = None
) -> DataFrame:
    """sha256-hex the customer-information columns ``<prefix><field>``
    that exist in ``df``; hash ``email_col`` only when it still contains
    '@' (not already hashed) — the reference's exact rule."""
    out = df
    for f in FB_FIELDS_TO_HASH:
        c = f"{prefix}{f}"
        if c in df.columns:
            out = out.withColumn(c, F.sha2(F.col(c).cast("string"), 256))
    if email_col and email_col in df.columns:
        out = out.withColumn(
            email_col,
            F.when(
                F.col(email_col).contains("@"),
                F.sha2(F.col(email_col).cast("string"), 256),
            ).otherwise(F.col(email_col)),
        )
    return out


class ConversionSpoolSink:
    """foreachBatch sink: write one text file of payload lines per batch
    under ``spool_dir/batch=<id>/``, overwriting on redelivery — the
    relay that drains the spool gets at-least-once files with stable
    names, and a replayed batch rewrites identical content (payloads are
    deterministic), so the spool is effectively idempotent."""

    def __init__(self, spool_dir: str, payload_col: str = "ga_payload"):
        self.spool_dir = spool_dir
        self.payload_col = payload_col

    def apply(self, batch_df: DataFrame, batch_id) -> None:
        (
            batch_df.select(self.payload_col)
            .write.mode("overwrite")
            .text(os.path.join(self.spool_dir, f"batch={batch_id}"))
        )
