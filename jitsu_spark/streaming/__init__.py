from jitsu_spark.streaming.bootstrap import bootstrap_snapshot, tail_filter
from jitsu_spark.streaming.runner import CdcStreamJob

__all__ = ["CdcStreamJob", "bootstrap_snapshot", "tail_filter"]
