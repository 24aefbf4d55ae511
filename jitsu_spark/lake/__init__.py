from jitsu_spark.lake.export_ddl import (
    alter_table_ddl,
    column_type,
    create_table_ddl,
    export_ddl,
)
from jitsu_spark.lake.maintenance import (
    expire_snapshots,
    overwrite_where,
    vacuum,
)
from jitsu_spark.lake.merge import append_batch, merge_batch
from jitsu_spark.lake.metadata import CommitConflict, Snapshot
from jitsu_spark.lake.mirror import (
    last_synced_version,
    sync_aggregate,
    sync_mirror,
)
from jitsu_spark.lake.table import LakeTable

__all__ = [
    "LakeTable",
    "Snapshot",
    "CommitConflict",
    "merge_batch",
    "append_batch",
    "overwrite_where",
    "vacuum",
    "expire_snapshots",
    "alter_table_ddl",
    "column_type",
    "create_table_ddl",
    "export_ddl",
    "sync_aggregate",
    "sync_mirror",
    "last_synced_version",
]
