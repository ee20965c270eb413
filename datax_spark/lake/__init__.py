from datax_spark.lake.merge import MergeStats, merge_into
from datax_spark.lake.replicate import SyncResult, sync
from datax_spark.lake.table import LakeTable, Manifest

__all__ = ["LakeTable", "Manifest", "merge_into", "MergeStats", "sync", "SyncResult"]
