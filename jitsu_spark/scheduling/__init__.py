from jitsu_spark.scheduling.scheduler import (  # noqa: F401
    CronSpec,
    Priority,
    SyncScheduler,
    Task,
)
