from jitsu_spark.lake.metadata import CommitConflict, Snapshot
from jitsu_spark.lake.table import LakeTable

__all__ = ["LakeTable", "Snapshot", "CommitConflict"]
