from jitsu_spark.streaming.runner import CdcStreamJob

__all__ = ["CdcStreamJob"]
