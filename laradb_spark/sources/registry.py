"""LaraContext — the relational front door (SURVEY.md §3.3).

The reference's "SQL path" is a Raco plan string compiled to Accumulo
iterators (reference: Main.kt:49-98, opt/RacoToAccumulo.kt:363-683). Here
the front door is Catalyst itself: register tables (parquet dirs, CSV, or
LaraTables) as temp views and run ``spark.sql`` — parser, analyzer,
optimizer, and physical planning are Spark's. A Raco-repr importer for
fidelity testing lives in laradb_spark/plans/raco.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import LaraSchema
from ..table import LaraTable


class LaraContext:
    """Catalog facade: register parquet/CSV paths as named tables, hand
    out LaraTable bindings, and front ``spark.sql`` over the registered
    views — the engine's analogue of the reference's catalog + SQL front
    door (RacoToAccumulo.kt's Scan name binding)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._lara: dict[str, LaraTable] = {}

    # --- catalog -------------------------------------------------------------

    def register_parquet(self, name: str, path: str) -> DataFrame:
        df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        return df

    def register_dir(self, sf_dir: str, tables: list[str] | None = None) -> None:
        """Register every parquet table of a testdata directory."""
        import os

        names = tables or [
            f[: -len(".parquet")] for f in os.listdir(sf_dir) if f.endswith(".parquet")
        ]
        for n in names:
            self.register_parquet(n, f"{sf_dir}/{n}.parquet")

    def register_lara(self, name: str, table: LaraTable) -> None:
        """Expose a LaraTable to SQL; Lara metadata kept engine-side."""
        table.df.createOrReplaceTempView(name)
        self._lara[name] = table

    def lara(self, name: str, schema: LaraSchema | None = None) -> LaraTable:
        """Fetch a registered LaraTable, or wrap a SQL view with a schema."""
        if name in self._lara:
            return self._lara[name]
        if schema is None:
            raise KeyError(f"{name!r} is not a registered LaraTable; pass a schema to wrap it")
        return LaraTable(self.spark.table(name), schema)

    # --- query ---------------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def explain_str(self, query: str) -> str:
        """Formatted physical plan (for plan assertions in tests)."""
        df = self.spark.sql(query)
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
