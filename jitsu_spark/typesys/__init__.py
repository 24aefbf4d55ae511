from jitsu_spark.typesys.lattice import (
    DataType,
    common_ancestor,
    datatype_for_spark,
    fold_types,
    spark_type_for,
    widen_spark_types,
)

__all__ = [
    "DataType",
    "common_ancestor",
    "datatype_for_spark",
    "fold_types",
    "spark_type_for",
    "widen_spark_types",
]
