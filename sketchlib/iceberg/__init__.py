"""Iceberg manifest-chain scanning without a runtime jar.

``snapshot_file_paths(table_dir)`` resolves
metadata.json -> manifest list -> manifests -> live data files and
feeds ``sketchlib.spark.direct.build_partials_direct(files=...)``;
``prune_files`` applies file-level min/max bounds before any scan
task is scheduled.
"""

from sketchlib.iceberg.avro import read_avro, write_avro
from sketchlib.iceberg.manifest import (
    DataFile,
    load_table_metadata,
    prune_files,
    snapshot_data_files,
    snapshot_file_paths,
)

__all__ = [
    "DataFile",
    "load_table_metadata",
    "prune_files",
    "read_avro",
    "snapshot_data_files",
    "snapshot_file_paths",
    "write_avro",
]
