from datax_spark.engine.replay import (
    DirtyDataError,
    EpochAuditError,
    EpochResult,
    ReplayConfig,
    ReplayCrash,
    ReplayEngine,
)

__all__ = [
    "ReplayEngine",
    "ReplayConfig",
    "EpochResult",
    "ReplayCrash",
    "DirtyDataError",
    "EpochAuditError",
]
