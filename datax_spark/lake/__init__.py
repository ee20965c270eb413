from datax_spark.lake.merge import MergeStats, merge_into
from datax_spark.lake.replicate import SyncResult, apply_change_batch, stream_sync, sync
from datax_spark.lake.table import LakeTable, Manifest

__all__ = [
    "LakeTable",
    "Manifest",
    "merge_into",
    "MergeStats",
    "sync",
    "SyncResult",
    "stream_sync",
    "apply_change_batch",
]
