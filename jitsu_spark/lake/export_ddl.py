"""Per-warehouse DDL export: StructType -> external CREATE/ALTER TABLE.

Reference semantics: the per-DWH type-mapping tables
``SchemaToPostgres`` (/root/reference/server/adapters/postgres.go:61-68),
``SchemaToRedshift`` (aws_redshift.go:36-43), ``SchemaToMysql``
(mysql.go:61-68), ``SchemaToClickhouse`` (clickhouse.go:38-45) and
``SchemaToBigQueryString`` (bigquery.go:16-23) and
``SchemaToSnowflake`` (snowflake.go:32-39) plus the CREATE/ALTER
templates around them — re-derived, no code ported. They let a lake
mirror maintained by ``sync_mirror`` be handed off to a real warehouse:
generate the DDL here, load the mirror's parquet there.

Coverage beyond the reference's five logical types: this engine's tables
carry token arrays, decimals, dates and binary, so each dialect maps
those too (arrays go to native array types where the target has them —
postgres ``[]``, ClickHouse ``Array(...)``, BigQuery ``ARRAY<...>`` —
and to JSON-ish text where it does not). The widening lattice's STRING
promotions (typesys/lattice.py) land on each dialect's text type, same
as the reference's STRING row.
"""

from __future__ import annotations

from pyspark.sql import types as T

DIALECTS = (
    "postgres", "redshift", "mysql", "clickhouse", "bigquery", "snowflake"
)

_INTS = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
_FLOATS = (T.DoubleType, T.FloatType)


def column_type(dt: T.DataType, dialect: str) -> str:
    """Map one Spark type to the dialect's column type."""
    if dialect not in DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; pick one of {DIALECTS}")
    if isinstance(dt, T.ArrayType):
        inner = column_type(dt.elementType, dialect)
        if dialect == "postgres":
            return f"{inner}[]"
        if dialect == "clickhouse":
            return f"Array({inner})"
        if dialect == "bigquery":
            return f"ARRAY<{inner}>"
        if dialect == "redshift":
            return "super"          # Redshift's semistructured type
        if dialect == "snowflake":
            return "ARRAY"          # Snowflake semistructured (VARIANT family)
        return "json"               # mysql
    if isinstance(dt, T.DecimalType):
        p, s = dt.precision, dt.scale
        return {
            "postgres": f"numeric({p},{s})",
            "redshift": f"numeric({p},{s})",
            "mysql": f"decimal({p},{s})",
            "clickhouse": f"Decimal({p},{s})",
            "bigquery": "BIGNUMERIC" if p > 38 else "NUMERIC",
            "snowflake": f"NUMBER({p},{s})",
        }[dialect]
    if isinstance(dt, T.StringType):
        return {
            "postgres": "text",
            "redshift": "character varying(65535)",
            "mysql": "text",
            "clickhouse": "String",
            "bigquery": "STRING",
            "snowflake": "text",
        }[dialect]
    if isinstance(dt, _INTS):
        return {
            "postgres": "bigint",
            "redshift": "bigint",
            "mysql": "bigint",
            "clickhouse": "Int64",
            "bigquery": "INTEGER",
            "snowflake": "bigint",
        }[dialect]
    if isinstance(dt, _FLOATS):
        return {
            "postgres": "numeric(38,18)",
            "redshift": "numeric(38,18)",
            "mysql": "float(38,18)",
            "clickhouse": "Float64",
            "bigquery": "FLOAT",
            "snowflake": "numeric(38,18)",
        }[dialect]
    if isinstance(dt, T.BooleanType):
        return {
            "postgres": "boolean",
            "redshift": "boolean",
            "mysql": "boolean",
            "clickhouse": "UInt8",
            "bigquery": "BOOLEAN",
            "snowflake": "boolean",
        }[dialect]
    if isinstance(dt, T.TimestampType):
        return {
            "postgres": "timestamp",
            "redshift": "timestamp",
            "mysql": "timestamp",
            "clickhouse": "DateTime",
            "bigquery": "TIMESTAMP",
            "snowflake": "timestamp(6)",
        }[dialect]
    if isinstance(dt, T.DateType):
        return {
            "postgres": "date",
            "redshift": "date",
            "mysql": "date",
            "clickhouse": "Date",
            "bigquery": "DATE",
            "snowflake": "date",
        }[dialect]
    if isinstance(dt, T.BinaryType):
        return {
            "postgres": "bytea",
            "redshift": "varbyte",
            "mysql": "blob",
            "clickhouse": "String",
            "bigquery": "BYTES",
            "snowflake": "binary",
        }[dialect]
    # UNKNOWN -> the dialect's text type, like the reference's UNKNOWN row
    return column_type(T.StringType(), dialect)


def _quote(dialect: str, *parts: str) -> str:
    q = "`" if dialect in ("mysql", "bigquery", "clickhouse") else '"'
    return ".".join(f"{q}{p}{q}" for p in parts if p)


def create_table_ddl(
    schema: T.StructType,
    table: str,
    dialect: str,
    key_field: str | None = None,
    schema_name: str | None = None,
) -> str:
    """CREATE TABLE statement for ``schema`` in the given dialect.

    ``key_field`` becomes the primary key (postgres/redshift/mysql), the
    ReplacingMergeTree ORDER BY key (ClickHouse — the reference's
    engine-level-dedup W9 target), and a no-op for BigQuery (no PK)."""
    cols = ",\n  ".join(
        f"{_quote(dialect, f.name)} {column_type(f.dataType, dialect)}"
        for f in schema.fields
    )
    fq = _quote(dialect, schema_name or "", table)
    if dialect == "clickhouse":
        engine = (
            f"ENGINE = ReplacingMergeTree ORDER BY ({_quote(dialect, key_field)})"
            if key_field
            else "ENGINE = MergeTree ORDER BY tuple()"
        )
        return f"CREATE TABLE {fq} (\n  {cols}\n) {engine}"
    pk = ""
    if key_field and dialect in ("postgres", "redshift", "mysql", "snowflake"):
        pk = f",\n  PRIMARY KEY ({_quote(dialect, key_field)})"
    return f"CREATE TABLE {fq} (\n  {cols}{pk}\n)"


def alter_table_ddl(
    old: T.StructType,
    new: T.StructType,
    table: str,
    dialect: str,
    schema_name: str | None = None,
) -> list[str]:
    """ALTER statements bringing a table at ``old`` up to ``new`` under the
    engine's add/widen-only evolution contract: new columns ADD, widened
    columns retype (postgres/clickhouse support it in place; BigQuery and
    Redshift widenings to STRING need a copy migration, flagged here by a
    comment statement rather than silently dropped)."""
    stmts: list[str] = []
    fq = _quote(dialect, schema_name or "", table)
    old_by_name = {f.name: f for f in old.fields}
    for f in new.fields:
        prev = old_by_name.get(f.name)
        tgt = column_type(f.dataType, dialect)
        if prev is None:
            col = _quote(dialect, f.name)
            stmts.append(f"ALTER TABLE {fq} ADD COLUMN {col} {tgt}")
            continue
        if column_type(prev.dataType, dialect) == tgt:
            continue
        col = _quote(dialect, f.name)
        if dialect == "postgres":
            stmts.append(
                f"ALTER TABLE {fq} ALTER COLUMN {col} TYPE {tgt} "
                f"USING {col}::{tgt}"
            )
        elif dialect == "mysql":
            stmts.append(f"ALTER TABLE {fq} MODIFY COLUMN {col} {tgt}")
        elif dialect == "clickhouse":
            stmts.append(f"ALTER TABLE {fq} MODIFY COLUMN {col} {tgt}")
        else:  # bigquery / redshift / snowflake: in-place retype across
            # type families unsupported (Snowflake's SET DATA TYPE only
            # widens within varchar/number)
            stmts.append(
                f"-- {dialect}: retype {f.name} -> {tgt} requires a "
                "copy migration (ADD new column, backfill, swap)"
            )
    return stmts


def export_ddl(
    table,
    dialect: str,
    table_name: str | None = None,
    schema_name: str | None = None,
) -> str:
    """CREATE TABLE DDL for a LakeTable (e.g. a ``sync_mirror`` mirror) so
    it can be handed off to an external warehouse."""
    import os

    snap = table.snapshot()
    name = table_name or os.path.basename(table.root.rstrip("/"))
    return create_table_ddl(
        table.schema(), name, dialect,
        key_field=snap.key_field, schema_name=schema_name,
    )
