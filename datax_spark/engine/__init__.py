from datax_spark.engine.replay import (
    BootstrapResult,
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
    "BootstrapResult",
    "ReplayCrash",
    "DirtyDataError",
    "EpochAuditError",
]
