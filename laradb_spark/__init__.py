"""laradb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dhutchis/LaraDB (the Lara algebra), plus a
relational SQL surface, structured-streaming windows, and large-scale
training-data pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Reference: /root/reference (dhutchis/LaraDB, Kotlin on Accumulo/Graphulo).
This is NOT a port — the Lara operators compile to DataFrame plans that
Catalyst optimizes; see SURVEY.md for the operator-by-operator mapping.
"""

from .schema import Attribute, LaraSchema, ValAttribute, spark_type
from .session import get_spark
from .table import LaraTable
from .functions.semiring import PLUS, TIMES, ExtFun, MapFun, PlusFun, TimesFun

__all__ = [
    "Attribute",
    "LaraSchema",
    "ValAttribute",
    "spark_type",
    "get_spark",
    "LaraTable",
    "PLUS",
    "TIMES",
    "ExtFun",
    "MapFun",
    "PlusFun",
    "TimesFun",
]

__version__ = "0.1.0"
