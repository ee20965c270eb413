from datax_spark.engine.replay import (
    BootstrapResult,
    ChunkResult,
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
    "ChunkResult",
    "ReplayCrash",
    "DirtyDataError",
    "EpochAuditError",
]
