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
