from datax_spark.engine.replay import EpochResult, ReplayConfig, ReplayCrash, ReplayEngine

__all__ = ["ReplayEngine", "ReplayConfig", "EpochResult", "ReplayCrash"]
