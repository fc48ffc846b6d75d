"""Pure-Python Iceberg v2 tables (filesystem catalog) for the engine.

The container lacks the iceberg-spark runtime jar (and has no network),
so — exactly like the vendored protobuf runtime that unblocked
transformWithState — the table format itself is implemented from the
PUBLIC spec (https://iceberg.apache.org/spec/): Avro object-container
manifests + manifest lists (avro.py), v2 metadata JSON with the
filesystem-table atomic-commit protocol (table.py), spec-conformant
schemas/field-ids/bounds/transforms incl. the murmur3 bucket hash
verified against the spec's own test vectors (spec.py), and a Spark
write path with vectorized transform evaluation + footer-stats bounds
(writer.py).

With this, the north rule's "Iceberg transcripts tables + exactly-once
Iceberg sink" stops being a documented swap point and becomes executed
code: streaming/sink.py's ExactlyOnceIcebergSink commits one snapshot
per micro-batch with the batch id in the snapshot summary (idempotent
replay = Iceberg's own exactly-once recipe), and scans plan files
through manifest pruning.
"""

from .maintenance import expire_snapshots, rewrite_data_files
from .table import (CommitConflict, IcebergTable, iceberg_to_spark_schema,
                    partition_range_filter)
from .writer import (murmur3_long_np, stage_dataframe, ts_micros,
                     write_dataframe)

__all__ = [
    "IcebergTable", "CommitConflict", "partition_range_filter",
    "iceberg_to_spark_schema", "write_dataframe", "stage_dataframe",
    "ts_micros", "murmur3_long_np", "rewrite_data_files",
    "expire_snapshots",
]
