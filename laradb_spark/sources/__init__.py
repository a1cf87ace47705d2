from .csv_io import read_csv, write_csv
from .registry import LaraContext

__all__ = ["read_csv", "write_csv", "LaraContext"]
