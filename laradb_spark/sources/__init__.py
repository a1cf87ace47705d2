from .csv_io import read_csv, write_csv
from .formats import read_jsonl, read_orc, write_jsonl, write_orc
from .graph_io import graph_tables, ingest_graph_files, read_triple_files
from .maintenance import compact_parquet
from .registry import LaraContext
from .sensor_io import read_sensor_csv, sensor_covariance_from_files

__all__ = [
    "read_csv",
    "write_csv",
    "read_jsonl",
    "write_jsonl",
    "read_orc",
    "write_orc",
    "LaraContext",
    "read_sensor_csv",
    "sensor_covariance_from_files",
    "read_triple_files",
    "graph_tables",
    "ingest_graph_files",
    "compact_parquet",
]
