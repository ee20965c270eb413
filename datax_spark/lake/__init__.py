from datax_spark.lake.joinview import JoinView, JoinViewSpec
from datax_spark.lake.matview import AggView, AggViewSpec
from datax_spark.lake.merge import MergeStats, merge_into
from datax_spark.lake.replicate import SyncResult, apply_change_batch, stream_sync, sync
from datax_spark.lake.table import LakeTable, Manifest

__all__ = [
    "LakeTable",
    "AggView",
    "AggViewSpec",
    "JoinView",
    "JoinViewSpec",
    "Manifest",
    "merge_into",
    "MergeStats",
    "sync",
    "SyncResult",
    "stream_sync",
    "apply_change_batch",
]
