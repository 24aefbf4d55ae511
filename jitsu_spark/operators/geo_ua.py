"""First-class geo-IP and user-agent enrichment operators (P11/P12).

Reference semantics (re-derived, no code ported):
- ip->geo lookup: /root/reference/server/enrichment/ip_lookup.go:32-64
  resolves a source IP through a MaxMind-style block database and sets a
  ``{country, city, latitude, longitude, zip, region}`` object on the
  event (model: /root/reference/server/geo/geo.go:25-31).
- UA parse: /root/reference/server/enrichment/user_agent_parse.go:32-60
  parses the user-agent string into ``{ua_family, ua_version, os_family,
  os_version, device_family, device_brand, device_model, bot}``
  (model: /root/reference/server/useragent/resolver.go:28-41); golden
  shapes in /root/reference/server/schema/processor_test.go:173-295.

Spark-first re-expression:

- ``with_geo_lookup`` is a **bucketed broadcast range join**: a CIDR
  block database is a range table (net_start..net_end), and a naive
  range join is O(|events| x |blocks|). Each block row is exploded to
  one row per /16 bucket it covers (real-world blocks span few), the
  event side computes ``ip >> 16`` — so the join is a plain EQUI-join on
  the bucket with a residual BETWEEN filter, and the (small, ~MaxMind
  sized) dim broadcasts. At 100 TB the fact side never shuffles;
  plan-asserted in tests/test_plans.py.
- ``with_parsed_ua`` is a pure-expression regex ruleset (Java regex on
  the JVM, inside whole-stage codegen — the reference's uap-go regex
  database is itself just ordered regex rules). No Python, no UDF; a
  richer rule file drops into the same RULES list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEO_FIELDS = ("country", "city", "latitude", "longitude", "zip", "region")


def ip_to_long(col: Column) -> Column:
    """Dotted-quad IPv4 string -> long (NULL for malformed input).

    Every octet must parse AND be in [0, 255]: an out-of-range octet like
    '10.0.0.300' would otherwise alias into a NEIGHBORING block's numeric
    range and return a wrong geo match — the reference skips enrichment on
    resolve errors, so malformed IPs must stay NULL, never mis-resolve.
    """
    p = F.split(col, r"\.")
    # try_cast: non-numeric octets stay NULL (ANSI cast would throw)
    octs = [p[i].try_cast("long") for i in range(4)]
    in_range = [
        F.when(o.isNotNull() & o.between(0, 255), o) for o in octs
    ]
    num = (
        in_range[0] * F.lit(16777216)
        + in_range[1] * F.lit(65536)
        + in_range[2] * F.lit(256)
        + in_range[3]
    )
    return F.when(F.size(p) == 4, num)


def with_geo_lookup(
    df: DataFrame,
    geo_dim: DataFrame,
    ip_col: str = "source_ip",
    out_prefix: str = "geo_",
    ip_num_col: str | None = None,
) -> DataFrame:
    """Enrich ``df`` with geo columns by CIDR-range lookup of ``ip_col``.

    ``geo_dim`` columns: net_start, net_end (long, inclusive) + any of
    GEO_FIELDS. Events whose IP matches no block (or is malformed) keep
    NULL geo columns — the reference skips enrichment on resolve errors.

    ``ip_num_col`` (optional): a column already holding the IP as a long
    (NULL for malformed). Callers that CONSTRUCT the dotted string from
    numeric octets (or store both forms) skip the per-row
    split/try_cast/range-check re-parse of ``ip_col`` — the caller
    asserts the two columns agree.

    Blocks must be NON-OVERLAPPING (the MaxMind invariant): an overlapping
    dim would silently duplicate fact rows through the range join. Call
    ``validate_geo_dim`` on untrusted block tables before joining.
    """
    geo_cols = [c for c in GEO_FIELDS if c in geo_dim.columns]
    dim = geo_dim.select(
        "net_start",
        "net_end",
        F.explode(
            F.sequence(
                F.shiftright(F.col("net_start"), 16),
                F.shiftright(F.col("net_end"), 16),
            )
        ).alias("_b16"),
        *[F.col(c).alias(f"{out_prefix}{c}") for c in geo_cols],
    )
    ip_num = (
        F.col(ip_num_col).cast("long")
        if ip_num_col is not None
        else ip_to_long(F.col(ip_col))
    )
    fact = df.withColumn("_ip_num", ip_num).withColumn(
        "_b16", F.shiftright(F.col("_ip_num"), 16)
    )
    joined = fact.join(
        F.broadcast(dim),
        on=(fact["_b16"] == dim["_b16"])
        & (F.col("_ip_num") >= F.col("net_start"))
        & (F.col("_ip_num") <= F.col("net_end")),
        how="left",
    )
    return joined.drop("_b16", "_ip_num", "net_start", "net_end")


def validate_geo_dim(geo_dim: DataFrame) -> None:
    """Raise if block ranges are malformed or overlap (the invariant the
    range join in ``with_geo_lookup`` relies on to emit at most one geo
    row per event). The dim is broadcast-sized, so one window pass over
    it is cheap."""
    from pyspark.sql import Window

    w = Window.orderBy("net_start")
    bad = (
        geo_dim.select("net_start", "net_end")
        .withColumn("_prev_end", F.lag("net_end").over(w))
        .filter(
            (F.col("net_end") < F.col("net_start"))
            | (F.col("_prev_end").isNotNull()
               & (F.col("net_start") <= F.col("_prev_end")))
        )
        .limit(1)
        .collect()
    )
    if bad:
        r = bad[0]
        raise ValueError(
            "geo_dim blocks overlap or are inverted near "
            f"net_start={r['net_start']} net_end={r['net_end']} "
            f"(prev_end={r['_prev_end']}); with_geo_lookup requires "
            "non-overlapping ranges"
        )


# ---------------------------------------------------------------------------
# UA parse
# ---------------------------------------------------------------------------

# ordered (family, detect-regex, version-regex) rules — first match wins,
# mirroring the uap core rules for the dominant browsers; all patterns are
# RE2-safe so the DuckDB oracle evaluates them identically
_UA_RULES = [
    ("Edge", r"Edg(?:e|A|iOS)?/", r"Edg(?:e|A|iOS)?/([0-9][0-9.]*)"),
    ("Opera", r"OPR/", r"OPR/([0-9][0-9.]*)"),
    ("Chrome", r"Chrome/", r"Chrome/([0-9][0-9.]*)"),
    ("Firefox", r"Firefox/", r"Firefox/([0-9][0-9.]*)"),
    ("Mobile Safari", r"iPhone.*Safari", r"Version/([0-9][0-9.]*)"),
    ("Safari", r"Safari/", r"Version/([0-9][0-9.]*)"),
]

_OS_RULES = [
    ("Windows", r"Windows NT ", r"Windows NT ([0-9][0-9.]*)"),
    ("iOS", r"iPhone OS |CPU OS ", r"OS ([0-9_]+)"),
    ("Mac OS X", r"Mac OS X", r"Mac OS X ([0-9_.]+)"),
    ("Android", r"Android", r"Android ([0-9][0-9.]*)"),
    ("Linux", r"Linux", r""),
]

_BOT_PATTERN = r"(?i)bot|crawler|spider|slurp|curl"


def _first_match(col: Column, rules, default: str):
    expr = F.lit(default)
    for family, detect, _ in reversed(rules):
        expr = F.when(col.rlike(detect), F.lit(family)).otherwise(expr)
    return expr


def _first_version(col: Column, rules):
    expr = F.lit("")
    for _, detect, version in reversed(rules):
        v = F.regexp_extract(col, version, 1) if version else F.lit("")
        expr = F.when(col.rlike(detect), v).otherwise(expr)
    return expr


def with_parsed_ua(
    df: DataFrame, ua_col: str = "user_agent", out_prefix: str = "ua_"
) -> DataFrame:
    """Parse ``ua_col`` into flat enrichment columns (reference model
    fields): <prefix>family/version/os_family/os_version/device_family/
    device_brand/device_model/bot. Pure expressions, codegen-friendly."""
    ua = F.col(ua_col)
    device_family = (
        F.when(ua.rlike(r"iPhone"), F.lit("iPhone"))
        .when(ua.rlike(r"iPad"), F.lit("iPad"))
        .when(ua.rlike(r"Macintosh"), F.lit("Mac"))
        .when(ua.rlike(r"Android"), F.lit("Generic Smartphone"))
        .otherwise(F.lit("Other"))
    )
    device_brand = (
        F.when(ua.rlike(r"iPhone|iPad|Macintosh"), F.lit("Apple"))
        .when(ua.rlike(r"SM-[A-Z0-9]+"), F.lit("Samsung"))
        .when(ua.rlike(r"Pixel"), F.lit("Google"))
        .otherwise(F.lit(""))
    )
    device_model = (
        F.when(ua.rlike(r"iPhone"), F.lit("iPhone"))
        .when(ua.rlike(r"iPad"), F.lit("iPad"))
        .when(ua.rlike(r"SM-[A-Z0-9]+"), F.regexp_extract(ua, r"(SM-[A-Z0-9]+)", 1))
        .when(ua.rlike(r"Pixel [0-9]+"), F.regexp_extract(ua, r"(Pixel [0-9]+)", 1))
        .otherwise(F.lit(""))
    )
    return df.select(
        "*",
        _first_match(ua, _UA_RULES, "Other").alias(f"{out_prefix}family"),
        _first_version(ua, _UA_RULES).alias(f"{out_prefix}version"),
        _first_match(ua, _OS_RULES, "Other").alias(f"{out_prefix}os_family"),
        F.translate(_first_version(ua, _OS_RULES), "_", ".").alias(
            f"{out_prefix}os_version"
        ),
        device_family.alias(f"{out_prefix}device_family"),
        device_brand.alias(f"{out_prefix}device_brand"),
        device_model.alias(f"{out_prefix}device_model"),
        ua.rlike(_BOT_PATTERN).alias(f"{out_prefix}bot"),
    )
