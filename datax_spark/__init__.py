"""datax_spark — a PySpark-native CDC / incremental-ingest engine.

Built from scratch with the data-processing capabilities of DataX
(reference surveyed in SURVEY.md): the reader → channel → writer plugin
pipeline is reimagined as a binlog/WAL-tail replay over an ordered
change-event log, applied with last-writer-wins semantics into a
snapshot-versioned lake table (Iceberg-style manifests + bucketed
parquet, copy-on-write MERGE), exactly-once via an epoch watermark and
atomic manifest commits, with salted repartitioning for hot-key skew,
additive schema evolution, checkpoint resume, and per-partition lineage
metrics.

Subpackages
-----------
lake       snapshot table format + MERGE (ref: HdfsWriter.java:151-196
           two-phase tmp-rename commit; CommonRdbmsWriter upsert)
operators  LWW dedup, salting, schema merge (ref: otsstreamreader LSN
           ordering, MultiVerModeRecordSender.java:83-121)
engine     micro-batch replay driver (ref: JobContainer.java:96-128
           lifecycle; OTSStreamReaderSlaveProxy.java:40-107 resume)
functions  dx_* transformer parity (ref: core transformer package) plus
           text-analysis / dedup / similarity ops for training pipelines
fixtures   deterministic change-event generator + sequential oracle
           (ref: StreamReader.java:94-166 synthetic source)
"""

__version__ = "0.1.0"
