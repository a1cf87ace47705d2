"""LaraTable — an associative table as (DataFrame, LaraSchema).

Implements the three-operator Lara algebra (Ext, Union, Join) plus the
derived/auxiliary ops (map, agg, rename, sort, load, store) with the
reference's semantics (dhutchis/LaraDB, api/TupleOp.kt), compiled to
plain DataFrame transformations so Catalyst plans the physical execution:

  - Ext        → select + explode(array<struct>) or mapInPandas
                 (reference: api/TupleOp.kt:183-272)
  - MergeUnion → unionByName + groupBy(common key prefix) + ⊕ aggregates
                 (reference: api/TupleOp.kt:295-521)
  - MergeAgg   → groupBy(keysKept) + ⊕ aggregates
                 (reference: api/TupleOp.kt:296,353-366)
  - MergeJoin  → equi-join on shared keys + per-attr ⊗ expressions
                 (reference: api/TupleOp.kt:610-826)
  - Sort       → key-order metadata change; physical sort is Catalyst's
                 job (reference: api/TupleOp.kt:569-592 materializes and
                 re-sorts — a pipeline breaker we deliberately do NOT port)

Scale notes: no operator here collects to the driver; unions/aggs/joins
compile to shuffles that AQE sizes at runtime; small sides should be
wrapped with ``broadcast()`` by the caller or left to the planner's
threshold. The reference's DAP/LAP access-path planning
(reference: opt/Schema.kt:28-96) is subsumed by Catalyst's
outputPartitioning/EnsureRequirements.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.semiring import ExtFun, MapFun, PlusFun, TimesFun, plus as _plus, times as _times
from .schema import Attribute, LaraSchema, ValAttribute


class LaraTable:
    """A Lara associative table: a DataFrame bound to a (keys → vals)
    schema, carrying the algebra (ext / map_vals / union / agg / join /
    rename / sort / store) as methods that build Catalyst plans. See
    ARCHITECTURE.md §"The Lara algebra on Catalyst"."""

    # O2 — auto-persist shared subplans: when the same derived table feeds
    # two or more downstream operators, persist it so the shared prefix
    # computes once (the reference materializes common subexpressions as
    # temp tables, reference: api/Lower.kt:107,118-126). Base loads are
    # exempt (caching a 100 TB scan is not a win; Catalyst already reuses
    # exchanges where partitioning lines up). persist() is lazy and
    # MEMORY_AND_DISK, so the cache spills rather than OOMs and the
    # CacheManager substitutes it into ALL plans over this subtree —
    # including ones built before the second consumer triggered it.
    AUTO_PERSIST = True

    def __init__(self, df: DataFrame, schema: LaraSchema, check: bool = True):
        self.df = df
        self.schema = schema
        self._consumers = 0
        self._base = False
        if check:
            missing = [n for n in schema.names if n not in df.columns]
            if missing:
                raise ValueError(f"DataFrame lacks schema columns {missing}; has {df.columns}")
            # Keep only schema columns, in schema order.
            if df.columns != schema.names:
                self.df = df.select(*schema.names)

    def _consume(self) -> None:
        self._consumers += 1
        if (
            LaraTable.AUTO_PERSIST
            and self._consumers == 2
            and not self._base
            and not self.df.is_cached
            and not self._plan_already_cached()
        ):
            self.df.persist()

    def _plan_already_cached(self) -> bool:
        """True when the CacheManager already holds a plan-equal entry
        (e.g. a twin LaraTable over the same subtree persisted first) —
        persisting again would warn and register a redundant cache."""
        try:
            jdf = self.df._jdf
            return jdf.sparkSession().sharedState().cacheManager().lookupCachedData(jdf).isDefined()
        except Exception:  # py4j surface moved — persist() stays correct
            return False

    # --- sources (reference: api/TupleOp.kt:274-290, 829-867) ---------------

    @staticmethod
    def load(spark: SparkSession, path_or_table: str, schema: LaraSchema) -> "LaraTable":
        """Load: bind a named table/path (reference: api/TupleOp.kt:274-283)."""
        if path_or_table.endswith(".parquet") or "/" in path_or_table:
            df = spark.read.parquet(path_or_table)
        else:
            df = spark.table(path_or_table)
        t = LaraTable(df, schema)
        t._base = True
        return t

    @staticmethod
    def from_rows(spark: SparkSession, rows: Iterable[tuple], schema: LaraSchema) -> "LaraTable":
        """LoadData: in-memory source (reference: api/TupleOp.kt:829-846)."""
        from .util import literal_frame

        t = LaraTable(literal_frame(spark, list(rows), schema.to_struct()), schema)
        t._base = True
        return t

    @staticmethod
    def empty(spark: SparkSession, schema: LaraSchema) -> "LaraTable":
        """Empty relation (reference: api/TupleOp.kt:285-290)."""
        from .util import literal_frame

        t = LaraTable(literal_frame(spark, [], schema.to_struct()), schema)
        t._base = True
        return t

    # --- Ext / map (reference: api/TupleOp.kt:183-272) -----------------------

    def ext(self, fn: ExtFun) -> "LaraTable":
        """Extension (flatMap): emit 0..n tuples per input; parent keys are
        prepended; ext keys must be disjoint from parent keys
        (reference: api/TupleOp.kt:198)."""
        self._consume()
        clash = set(self.schema.key_names) & set(fn.ext_schema.names)
        if clash:
            raise ValueError(f"ext attrs {sorted(clash)} clash with parent keys "
                             f"(reference: api/TupleOp.kt:198)")
        out_schema = LaraSchema(
            self.schema.keys + fn.ext_schema.keys, fn.ext_schema.vals
        )
        pkeys = self.schema.key_names
        if fn.expr is not None:
            arr = fn.expr(*[self.df[c] for c in fn.expr_cols])
            exploded = self.df.select(*pkeys, F.explode(arr).alias("_ext"))
            out = exploded.select(*pkeys, *[F.col(f"_ext.{n}") for n in fn.ext_schema.names])
            return LaraTable(out, out_schema)
        # General path: arbitrary Python flatMap via Arrow-batched
        # mapInPandas. Vectorized batch contract preferred; the per-tuple
        # py_fn is wrapped into a batch function (compatibility shim).
        import pandas as pd

        struct = out_schema.to_struct()
        in_cols = list(self.df.columns)
        ext_names = fn.ext_schema.names
        out_names = out_schema.names

        if fn.batch_fn is not None:
            batch_fn = fn.batch_fn
        else:
            py_fn = fn.py_fn

            def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
                rows = []
                for rec in pdf.to_dict("records"):
                    for emitted in py_fn(rec):
                        rows.append({**{k: rec[k] for k in pkeys},
                                     **{n: emitted.get(n) for n in ext_names}})
                return pd.DataFrame(rows, columns=out_names)

        def run(batches):
            for pdf in batches:
                out = batch_fn(pdf)
                missing = [n for n in out_names if n not in out.columns]
                if missing:
                    raise ValueError(
                        f"ExtFun {fn.name!r} batch output lacks columns {missing}"
                    )
                yield out[out_names] if len(out) else pd.DataFrame(
                    {n: [] for n in out_names}
                )

        return LaraTable(self.df.select(*in_cols).mapInPandas(run, struct), out_schema)

    def map(self, fn: MapFun) -> "LaraTable":
        """1→1 value transform (reference: api/TupleOp.kt:184 via MapFun)."""
        self._consume()
        out_schema = LaraSchema(self.schema.keys, fn.out_vals)
        cols = [F.col(k) for k in self.schema.key_names]
        cols += [fn.exprs[v.name](self.df).alias(v.name) for v in fn.out_vals]
        return LaraTable(self.df.select(*cols), out_schema)

    def map_vals(self, **exprs: Column) -> "LaraTable":
        """Convenience map: keep keys, replace vals with named Column exprs."""
        self._consume()
        vals = tuple(ValAttribute(n, "DOUBLE") for n in exprs)
        cols = [F.col(k) for k in self.schema.key_names] + [c.alias(n) for n, c in exprs.items()]
        return LaraTable(self.df.select(*cols), LaraSchema(self.schema.keys, vals), check=False)

    # --- Union / Agg (reference: api/TupleOp.kt:295-521) ---------------------

    def union(self, other: "LaraTable", plus_funs: Mapping[str, str | PlusFun]) -> "LaraTable":
        """MergeUnion ⊎ₚ: keys = longest common key prefix; vals = union of
        val attrs; colliding tuples fold value-wise with per-attr ⊕
        (reference: api/TupleOp.kt:295-521). Identity must equal the attr
        default (reference: api/TupleOp.kt:313-319)."""
        self._consume()
        other._consume()
        keys = self.schema.common_key_prefix(other.schema)
        vals = self.schema.union_vals(other.schema)
        funs = {v.name: _plus(plus_funs[v.name]) for v in vals}
        for v in vals:
            if funs[v.name].identity != v.default:
                raise ValueError(
                    f"PlusFun {funs[v.name].name!r} identity {funs[v.name].identity!r} != "
                    f"default {v.default!r} of {v.name!r} (reference: api/TupleOp.kt:313-319)"
                )
        key_names = [a.name for a in keys]

        def side(t: "LaraTable") -> DataFrame:
            cols: list[Column] = [F.col(k) for k in key_names]
            has = set(t.schema.val_names)
            for v in vals:
                if v.name in has:
                    cols.append(F.col(v.name))
                else:
                    # Absent attr: this parent holds the default everywhere.
                    cols.append(F.lit(v.default).cast(v.spark_type).alias(v.name))
            return t.df.select(*cols)

        both = side(self).unionByName(side(other))
        aggs = [funs[v.name].aggregate(F.col(v.name)).alias(v.name) for v in vals]
        out = both.groupBy(*key_names).agg(*aggs)
        # Same result-type rule as agg(): fixed-result builtins (count/any/
        # all/concat) change the column's type; the schema must follow.
        out_vals = tuple(
            ValAttribute(v.name, funs[v.name].result_type, funs[v.name].identity)
            if funs[v.name].fixed_result
            else v
            for v in vals
        )
        return LaraTable(out, LaraSchema(tuple(keys), out_vals))

    @staticmethod
    def union_many(tables: list["LaraTable"], plus_funs: Mapping[str, str | PlusFun]) -> "LaraTable":
        """n-way MergeUnion (the reference's Merger aligns n sorted inputs,
        reference: opt/TupleImpl.kt:24-140). Folding binary unions is
        semantically exact (⊕ is associative-commutative by contract) and
        Catalyst flattens the unions into one n-child Union + a single
        aggregate — no per-step shuffles."""
        if not tables:
            raise ValueError("union_many needs at least one table")
        out = tables[0]
        for t in tables[1:]:
            out = out.union(t, plus_funs)
        return out

    def agg(self, keys_kept: list[str], plus_funs: Mapping[str, str | PlusFun]) -> "LaraTable":
        """MergeAgg: drop keys not kept, fold values with ⊕
        (reference: api/TupleOp.kt:296,353-366). Spark's hash aggregate does
        the partial/final (combiner) split automatically — the reference's
        AggregatePush optimization (reference: sensor/SensorCalc.kt:313-337)."""
        self._consume()
        unknown = set(keys_kept) - set(self.schema.key_names)
        if unknown:
            raise ValueError(f"agg keys {sorted(unknown)} not in {self.schema.key_names}")
        keys = tuple(a for a in self.schema.keys if a.name in set(keys_kept))
        funs = {n: _plus(f) for n, f in plus_funs.items()}
        vals = []
        aggs = []
        for v in self.schema.vals:
            if v.name not in funs:
                continue
            f = funs[v.name]
            # Builtins with input-independent output (count/any/all/concat)
            # record result_type, not the input attr's type — the DataFrame
            # column IS e.g. LONG for count over DOUBLE, and downstream
            # default-cast/union logic must agree with it.
            fixed = f.agg is None or f.fixed_result
            vals.append(
                ValAttribute(
                    v.name,
                    f.result_type if fixed else v.type,
                    f.identity if f.fixed_result else v.default,
                )
            )
            aggs.append(f.aggregate(F.col(v.name)).alias(v.name))
        out = self.df.groupBy(*[a.name for a in keys]).agg(*aggs)
        return LaraTable(out, LaraSchema(keys, tuple(vals)))

    # --- Join (reference: api/TupleOp.kt:610-826) -----------------------------

    def join(
        self,
        other: "LaraTable",
        times_funs: Mapping[str, str | TimesFun],
        discard_zero: bool = False,
        broadcast_right: bool = False,
    ) -> "LaraTable":
        """MergeJoin ⋈ₓ: keys = union of key attrs (shared must be a common
        prefix); vals = intersection, combined per-attr with ⊗
        (reference: api/TupleOp.kt:610-826). Annihilators must equal the
        parents' defaults (reference: api/TupleOp.kt:649-652).

        Physical: plain equi-join — Catalyst picks broadcast-hash vs
        sort-merge (the reference hand-rolls a skip-ahead sort-merge,
        reference: api/TupleOp.kt:746-757; nothing to port).
        ``discard_zero`` applies the reference's ZeroDiscard optimization
        (reference: sensor/SensorCalc.kt:619-623): drop results equal to
        the annihilating default.
        """
        self._consume()
        other._consume()
        keys = self.schema.union_keys_prefix(other.schema)
        shared = [a.name for a in self.schema.keys if a.name in set(other.schema.key_names)]
        val_names = self.schema.intersect_val_names(other.schema)
        funs = {n: _times(times_funs[n]) for n in val_names}
        for n in val_names:
            f = funs[n]
            la, ra = self.schema.val(n).default, other.schema.val(n).default
            if f.left_annihilator != la or f.right_annihilator != ra:
                raise ValueError(
                    f"TimesFun {f.name!r} annihilators ({f.left_annihilator!r},"
                    f" {f.right_annihilator!r}) must equal parent defaults ({la!r}, {ra!r})"
                    f" for {n!r} (reference: api/TupleOp.kt:649-652)"
                )
        l = self.df
        r = other.df
        for n in val_names:
            l = l.withColumnRenamed(n, f"__l_{n}")
            r = r.withColumnRenamed(n, f"__r_{n}")
        if broadcast_right:
            r = F.broadcast(r)
        if not shared:
            joined = l.crossJoin(r)
        else:
            joined = l.join(r, on=shared, how="inner")
        vals = tuple(
            ValAttribute(n, funs[n].result_type, funs[n].result_default) for n in val_names
        )
        cols = [F.col(a.name) for a in keys]
        cols += [funs[n].apply(F.col(f"__l_{n}"), F.col(f"__r_{n}")).alias(n) for n in val_names]
        out = joined.select(*cols)
        if discard_zero:
            for v in vals:
                if v.default is not None:
                    out = out.filter(F.col(v.name) != F.lit(v.default))
        return LaraTable(out, LaraSchema(tuple(keys), vals))

    # --- Rename / Sort / filter (reference: api/TupleOp.kt:523-592) ----------

    def rename(self, mapping: Mapping[str, str]) -> "LaraTable":
        """Rename attributes (reference: api/TupleOp.kt:523-567)."""
        self._consume()
        keys = tuple(Attribute(mapping.get(a.name, a.name), a.type) for a in self.schema.keys)
        vals = tuple(
            ValAttribute(mapping.get(a.name, a.name), a.type, a.default) for a in self.schema.vals
        )
        # single select, not sequential withColumnRenamed: a swap mapping
        # like {src: dst, dst: src} would otherwise collide mid-sequence
        df = self.df.select(
            *[F.col(c).alias(mapping.get(c, c)) for c in self.df.columns]
        )
        return LaraTable(df, LaraSchema(keys, vals))

    def sort(self, new_key_order: list[str], physical: bool = False) -> "LaraTable":
        """Sort: reorder the key attributes (changes the access path,
        reference: api/TupleOp.kt:569-592). In Spark this is metadata —
        hash joins/aggs don't need sorted input, so the reference's
        full-materialize re-sort (its pipeline breaker) compiles to
        nothing. ``physical=True`` additionally range-partitions and sorts
        within partitions (for sorted sinks)."""
        self._consume()
        if sorted(new_key_order) != sorted(self.schema.key_names):
            raise ValueError(f"sort must permute keys {self.schema.key_names}")
        by_name = {a.name: a for a in self.schema.keys}
        keys = tuple(by_name[n] for n in new_key_order)
        df = self.df
        if physical:
            df = df.repartitionByRange(*new_key_order).sortWithinPartitions(*new_key_order)
        return LaraTable(df.select(*new_key_order, *self.schema.val_names),
                         LaraSchema(keys, self.schema.vals))

    def filter(self, predicate: Column | str) -> "LaraTable":
        """Row filter (reference Select lowering only supports leading-key
        ranges, reference: opt/RacoToAccumulo.kt:541-643; Spark pushes any
        predicate to the scan)."""
        self._consume()
        return LaraTable(self.df.filter(predicate), self.schema, check=False)

    # --- sink (reference: api/TupleOp.kt:595-605) -----------------------------

    def store(self, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
        """Store: write parquet (reference: api/TupleOp.kt:595-605 writes an
        Accumulo table via RemoteWriteIterator)."""
        self._consume()
        w = self.df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def cache(self) -> "LaraTable":
        """Persist a shared subplan — the reference's common-subexpression
        temp tables (reference: api/Lower.kt:107,118-126)."""
        return LaraTable(self.df.persist(), self.schema, check=False)

    def collect_sorted(self) -> list[tuple]:
        """Test helper: rows ordered by key attributes (the reference's
        tables are always key-sorted; Spark output order is undefined)."""
        return [tuple(r) for r in self.df.orderBy(*self.schema.key_names).collect()]
