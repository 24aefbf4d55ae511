"""LCA lattice unit tests — table-driven, mirroring the coverage of the
reference's converter_test.go/datatype_test.go (cases re-derived from the
documented semantics, not copied)."""

import pytest
from pyspark.sql import types as T

from jitsu_spark.typesys import DataType as D
from jitsu_spark.typesys import common_ancestor, fold_types, widen_spark_types


@pytest.mark.parametrize(
    "a,b,want",
    [
        (D.BOOL, D.BOOL, D.BOOL),
        (D.BOOL, D.INT64, D.INT64),
        (D.BOOL, D.FLOAT64, D.FLOAT64),
        (D.BOOL, D.STRING, D.STRING),
        (D.BOOL, D.TIMESTAMP, D.STRING),
        (D.INT64, D.FLOAT64, D.FLOAT64),
        (D.INT64, D.STRING, D.STRING),
        (D.INT64, D.TIMESTAMP, D.STRING),
        (D.FLOAT64, D.STRING, D.STRING),
        (D.FLOAT64, D.TIMESTAMP, D.STRING),
        (D.STRING, D.TIMESTAMP, D.STRING),
        (D.TIMESTAMP, D.TIMESTAMP, D.TIMESTAMP),
        (D.UNKNOWN, D.INT64, D.UNKNOWN),
    ],
)
def test_common_ancestor(a, b, want):
    assert common_ancestor(a, b) == want
    assert common_ancestor(b, a) == want  # symmetric


def test_fold_types():
    assert fold_types([D.BOOL, D.INT64, D.FLOAT64]) == D.FLOAT64
    assert fold_types([D.FLOAT64, D.STRING]) == D.STRING
    assert fold_types([D.INT64, D.TIMESTAMP]) == D.STRING
    assert fold_types([]) == D.UNKNOWN


@pytest.mark.parametrize(
    "a,b,want",
    [
        (T.IntegerType(), T.LongType(), T.LongType()),
        (T.IntegerType(), T.DoubleType(), T.DoubleType()),
        (T.LongType(), T.StringType(), T.StringType()),
        (T.FloatType(), T.DoubleType(), T.DoubleType()),
        (T.TimestampType(), T.StringType(), T.StringType()),
        (T.BooleanType(), T.LongType(), T.LongType()),
        (T.DoubleType(), T.TimestampType(), T.StringType()),
        (
            T.ArrayType(T.IntegerType()),
            T.ArrayType(T.LongType()),
            T.ArrayType(T.LongType(), True),
        ),
        (T.ArrayType(T.IntegerType()), T.StringType(), T.StringType()),
    ],
)
def test_widen_spark_types(a, b, want):
    assert widen_spark_types(a, b).simpleString() == want.simpleString()
    assert widen_spark_types(b, a).simpleString() == want.simpleString()


def test_widen_structs():
    a = T.StructType([T.StructField("x", T.IntegerType())])
    b = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.StringType())]
    )
    w = widen_spark_types(a, b)
    assert isinstance(w, T.StructType)
    assert w["x"].dataType.simpleString() == "double"
    assert w["y"].dataType.simpleString() == "string"


def test_max_columns_guard():
    """D7: evolution beyond the table's column cap is rejected instead of
    growing the schema unboundedly (dynamic payloads at scale)."""
    import pytest
    from pyspark.sql import types as T

    from jitsu_spark.typesys.evolution import (
        SchemaTooWideError,
        max_columns_of,
        plan_evolution,
    )

    base = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("a", T.LongType())]
    )
    wide = T.StructType(
        [T.StructField("k", T.StringType())]
        + [T.StructField(f"c{i}", T.LongType()) for i in range(5)]
    )
    # under the cap: fine
    plan = plan_evolution(base, wide, frozen=("k",), max_columns=10)
    assert len(plan.target.fields) == 7
    # over the cap: rejected with the offending columns named
    with pytest.raises(SchemaTooWideError, match="c0"):
        plan_evolution(base, wide, frozen=("k",), max_columns=4)
    # property plumbing: absent/0 = unlimited (reference gate semantics)
    assert max_columns_of({}) is None
    assert max_columns_of({"schema.max_columns": 0}) is None
    assert max_columns_of({"schema.max_columns": "8"}) == 8


# ---------------------------------------------------------------------------
# export DDL: StructType -> per-warehouse types (reference SchemaTo* tables)
# ---------------------------------------------------------------------------

def test_export_ddl_reference_type_tables():
    from pyspark.sql import types as T

    from jitsu_spark.lake.export_ddl import column_type

    # the five logical types, matching the reference's SchemaTo* rows
    cases = {
        T.StringType(): ("text", "character varying(65535)", "text",
                         "String", "STRING"),
        T.LongType(): ("bigint", "bigint", "bigint", "Int64", "INTEGER"),
        T.DoubleType(): ("numeric(38,18)", "numeric(38,18)", "float(38,18)",
                         "Float64", "FLOAT"),
        T.TimestampType(): ("timestamp", "timestamp", "timestamp",
                            "DateTime", "TIMESTAMP"),
        T.BooleanType(): ("boolean", "boolean", "boolean", "UInt8",
                          "BOOLEAN"),
    }
    for dt, (pg, rs, my, ch, bq) in cases.items():
        assert column_type(dt, "postgres") == pg
        assert column_type(dt, "redshift") == rs
        assert column_type(dt, "mysql") == my
        assert column_type(dt, "clickhouse") == ch
        assert column_type(dt, "bigquery") == bq
    # snowflake (reference SchemaToSnowflake, snowflake.go:32-39):
    # text / bigint / numeric(38,18) / timestamp(6) / boolean
    sf = {
        T.StringType(): "text",
        T.LongType(): "bigint",
        T.DoubleType(): "numeric(38,18)",
        T.TimestampType(): "timestamp(6)",
        T.BooleanType(): "boolean",
    }
    for dt, want in sf.items():
        assert column_type(dt, "snowflake") == want
    # engine extensions: token arrays, decimals
    arr = T.ArrayType(T.IntegerType())
    assert column_type(arr, "postgres") == "bigint[]"
    assert column_type(arr, "clickhouse") == "Array(Int64)"
    assert column_type(arr, "bigquery") == "ARRAY<INTEGER>"
    assert column_type(arr, "snowflake") == "ARRAY"
    assert column_type(T.DecimalType(18, 2), "postgres") == "numeric(18,2)"
    assert column_type(T.DecimalType(18, 2), "snowflake") == "NUMBER(18,2)"
    assert column_type(T.BinaryType(), "snowflake") == "binary"
    assert column_type(T.DateType(), "snowflake") == "date"


def test_export_ddl_widening_lattice_corners():
    """LCA promotions must land on each dialect's text/float row exactly
    like the reference's STRING/FLOAT64 mappings."""
    from pyspark.sql import types as T

    from jitsu_spark.lake.export_ddl import column_type
    from jitsu_spark.typesys.lattice import (
        DataType, common_ancestor, spark_type_for as logical_to_spark,
    )

    # FLOAT64 ⊔ TIMESTAMP = STRING -> text / String / STRING
    lca = common_ancestor(DataType.FLOAT64, DataType.TIMESTAMP)
    assert lca == DataType.STRING
    sdt = logical_to_spark(lca)
    assert column_type(sdt, "postgres") == "text"
    assert column_type(sdt, "clickhouse") == "String"
    assert column_type(sdt, "bigquery") == "STRING"
    assert column_type(sdt, "snowflake") == "text"
    # INT64 ⊔ FLOAT64 = FLOAT64 -> numeric(38,18) / Float64 / FLOAT
    lca2 = logical_to_spark(common_ancestor(DataType.INT64, DataType.FLOAT64))
    assert column_type(lca2, "postgres") == "numeric(38,18)"
    assert column_type(lca2, "clickhouse") == "Float64"
    assert column_type(lca2, "snowflake") == "numeric(38,18)"
    # BOOL ⊔ INT64 = INT64 -> bigint / Int64 / INTEGER
    lca3 = logical_to_spark(common_ancestor(DataType.BOOL, DataType.INT64))
    assert column_type(lca3, "bigquery") == "INTEGER"
    assert column_type(lca3, "snowflake") == "bigint"


def test_export_create_and_alter_ddl():
    from pyspark.sql import types as T

    from jitsu_spark.lake.export_ddl import alter_table_ddl, create_table_ddl

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
    ])
    pg = create_table_ddl(schema, "tokens_tbl", "postgres",
                          key_field="doc_id", schema_name="lake")
    assert '"lake"."tokens_tbl"' in pg
    assert '"tokens" bigint[]' in pg
    assert 'PRIMARY KEY ("doc_id")' in pg
    ch = create_table_ddl(schema, "tokens_tbl", "clickhouse",
                          key_field="doc_id")
    assert "ReplacingMergeTree ORDER BY (`doc_id`)" in ch
    bq = create_table_ddl(schema, "tokens_tbl", "bigquery")
    assert "ARRAY<INTEGER>" in bq and "PRIMARY KEY" not in bq
    sf = create_table_ddl(schema, "tokens_tbl", "snowflake",
                          key_field="doc_id", schema_name="lake")
    assert '"lake"."tokens_tbl"' in sf
    assert '"tokens" ARRAY' in sf
    assert 'PRIMARY KEY ("doc_id")' in sf

    # add/widen evolution: new column ADDs, long->string widening retypes
    old = T.StructType([T.StructField("doc_id", T.StringType()),
                        T.StructField("v", T.LongType())])
    new = T.StructType([T.StructField("doc_id", T.StringType()),
                        T.StructField("v", T.StringType()),
                        T.StructField("lang", T.StringType())])
    stmts = alter_table_ddl(old, new, "t", "postgres")
    assert any("ALTER COLUMN" in s and "text" in s for s in stmts)
    assert any('ADD COLUMN "lang" text' in s for s in stmts)
    stmts_bq = alter_table_ddl(old, new, "t", "bigquery")
    assert any("copy migration" in s for s in stmts_bq)
    assert any("ADD COLUMN `lang` STRING" in s for s in stmts_bq)
    # snowflake: cross-family retype flagged, new column ADDs normally
    stmts_sf = alter_table_ddl(old, new, "t", "snowflake")
    assert any("copy migration" in s for s in stmts_sf)
    assert any('ADD COLUMN "lang" text' in s for s in stmts_sf)
