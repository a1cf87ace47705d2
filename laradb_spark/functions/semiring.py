"""The Lara UDF algebra: PlusFun / TimesFun / ExtFun / MapFun.

Reference (dhutchis/LaraDB, api/Schema.kt):
  - ``PlusFun(name, identity, plus)`` — commutative monoid used by
    Union/Agg (reference: api/Schema.kt:265-326).
  - ``TimesFun(name, leftAnnihilator, rightAnnihilator, resultType, times)``
    — ⊗ with annihilators, used by Join (reference: api/Schema.kt:330-397).
  - ``ExtFun(name, extSchema, fn)`` — tuple → 0..n tuples (flatMap)
    (reference: api/Schema.kt:229-250).
  - ``MapFun`` — default-preserving 1→1 value transform
    (reference: api/Schema.kt:252-261).

Spark mapping — two tiers per function:
  * FAST path: a JVM-side Column expression (whole-stage codegen,
    vectorized, partial aggregation for free). This covers every
    combiner the reference ships (sum, min, max, first, count,
    string-concat, boolean or/and, numeric ×/−/÷).
  * GENERAL path: a binary fold expression applied with
    ``F.aggregate(collect_list(...))`` (still JVM-side) or, as a last
    resort, a pandas GROUPED_AGG UDF. Row-at-a-time Python UDFs are
    never used.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import LaraSchema, ValAttribute

AggBuilder = Callable[[Column], Column]
BinOp = Callable[[Column, Column], Column]


@dataclass(frozen=True)
class PlusFun:
    """Commutative monoid ⊕ for Union/Agg (reference: api/Schema.kt:265-326).

    ``identity`` must equal the value attribute's default where used
    (checked by Union — reference: api/TupleOp.kt:313-319).
    """

    name: str
    identity: Any
    agg: AggBuilder | None = None  # fast path: built-in aggregate
    combine: BinOp | None = None  # general path: binary fold
    result_type: str = "DOUBLE"
    # True for aggregates whose output type is input-independent
    # (count → LONG, any/all → BOOLEAN, concat → STRING): the schema must
    # record result_type, not the input attribute's type.
    fixed_result: bool = False

    def aggregate(self, col: Column) -> Column:
        if self.agg is not None:
            return self.agg(col)
        if self.combine is None:
            raise ValueError(f"PlusFun {self.name!r} has neither agg nor combine")
        # General path, still JVM-side: fold the group's values with the
        # binary ⊕ starting from identity. No partial agg, so reserve for
        # genuinely custom monoids.
        lit_id = F.lit(self.identity)
        if self.identity is None:
            lit_id = F.lit(None).cast(ValAttribute("_", self.result_type).spark_type)
        return F.aggregate(F.collect_list(col), lit_id, self.combine)

    def with_identity(self, identity: Any) -> "PlusFun":
        """Rebind identity (reference: PlusFun.withIdentity, api/Schema.kt:287-300)."""
        return PlusFun(self.name, identity, self.agg, self.combine, self.result_type, self.fixed_result)


@dataclass(frozen=True)
class TimesFun:
    """⊗ with annihilators for Join (reference: api/Schema.kt:330-397).

    ``left/right_annihilator`` must equal the two parents' defaults
    (checked by Join — reference: api/TupleOp.kt:649-652): times(default, y)
    = default ensures absent keys stay absent, which is what lets an inner
    join implement total-table ⋈.
    """

    name: str
    left_annihilator: Any
    right_annihilator: Any
    times: BinOp = None  # type: ignore[assignment]
    result_type: str = "DOUBLE"
    result_default: Any = None

    def apply(self, a: Column, b: Column) -> Column:
        return self.times(a, b)

    def with_annihilators(self, left: Any, right: Any) -> "TimesFun":
        """Rebind annihilators to match new parent defaults (reference:
        TimesFun.withAnnihilators, api/Schema.kt:362-377)."""
        return TimesFun(self.name, left, right, self.times, self.result_type, self.result_default)


@dataclass(frozen=True)
class ExtFun:
    """flatMap: one input tuple → 0..n tuples of NEW key+val attributes
    (reference: api/Schema.kt:229-250). The Ext operator prepends parent keys.

    Fast path: ``expr`` maps input columns to an ``array<struct<...>>``
    Column that Ext explodes (pure JVM). General paths, both via
    mapInPandas (Arrow): ``batch_fn`` is the vectorized contract — whole
    input pandas batch in, output batch (parent keys + ext attrs, 0..n
    rows per input) out — preferred, since per-batch pandas/NumPy ops
    amortize the Python overhead; ``py_fn`` is the per-tuple
    ``dict -> list[dict]`` compatibility shim (the reference's ExtFun is
    also per-tuple, api/Schema.kt:229-250).
    """

    name: str
    ext_schema: LaraSchema
    expr: Callable[..., Column] | None = None  # (*parent cols as Column) -> array<struct>
    expr_cols: tuple[str, ...] = ()  # parent columns fed to expr
    py_fn: Callable[[dict], list[dict]] | None = None
    batch_fn: Callable[..., Any] | None = None  # (pd.DataFrame) -> pd.DataFrame

    def __post_init__(self) -> None:
        if self.expr is None and self.py_fn is None and self.batch_fn is None:
            raise ValueError(f"ExtFun {self.name!r} needs expr, batch_fn, or py_fn")


@dataclass(frozen=True)
class MapFun:
    """1→1 value transform; must map defaults to defaults
    (reference: api/Schema.kt:252-261). ``exprs`` gives each output value
    attribute as a Column expression over the parent's columns."""

    name: str
    out_vals: tuple[ValAttribute, ...]
    exprs: dict[str, Callable[..., Column]] = field(default_factory=dict)  # name -> fn(df) -> Column


# --------------------------------------------------------------------------
# Registry of named monoids/semirings — the reference's built-in combiners
# (DoubleSummingCombiner, CombineSumCnt, …) plus the obvious completions.
# --------------------------------------------------------------------------

def _sum_with_identity(identity: Any) -> AggBuilder:
    if identity is None or identity == 0:
        return lambda c: F.sum(c)
    return lambda c: F.coalesce(F.sum(c), F.lit(identity))


PLUS: dict[str, PlusFun] = {
    # F.sum skips nulls and returns null on empty → exactly the
    # null-identity monoid the sensor query uses (reference:
    # examples/sensor/SensorQuery.kt:63-74 ``plusFun`` on NDOUBLE).
    "sum": PlusFun("sum", 0.0, agg=lambda c: F.sum(c)),
    "sum_null": PlusFun("sum_null", None, agg=lambda c: F.sum(c)),
    "sum_long": PlusFun("sum_long", 0, agg=lambda c: F.sum(c), result_type="LONG"),
    "count": PlusFun("count", 0, agg=lambda c: F.count(c), result_type="LONG", fixed_result=True),
    "min": PlusFun("min", None, agg=lambda c: F.min(c)),
    "max": PlusFun("max", None, agg=lambda c: F.max(c)),
    "first": PlusFun("first", None, agg=lambda c: F.first(c, ignorenulls=True)),
    "any": PlusFun("any", False, agg=lambda c: F.max(c), result_type="BOOLEAN", fixed_result=True),
    "all": PlusFun("all", True, agg=lambda c: F.min(c), result_type="BOOLEAN", fixed_result=True),
    "concat": PlusFun(
        "concat", "", agg=lambda c: F.concat_ws("", F.collect_list(c)),
        result_type="STRING", fixed_result=True,
    ),
    # plusErrorFun: the reference's "collisions are a bug" monoid
    # (reference: api/Schema.kt:311-319) — raise if two tuples collide.
    "error": PlusFun(
        "error",
        None,
        agg=lambda c: F.when(F.count(c) <= 1, F.first(c)).otherwise(
            F.raise_error(F.lit("plusErrorFun: key collision in union/agg"))
        ),
    ),
}

TIMES: dict[str, TimesFun] = {
    # ``*`` propagates null → null-annihilator semiring, exact match for
    # NDOUBLE times (reference: examples/sensor/SensorQuery.kt:63-74).
    "multiply": TimesFun("multiply", 0.0, 0.0, lambda a, b: a * b, result_default=0.0),
    "multiply_null": TimesFun("multiply_null", None, None, lambda a, b: a * b),
    "subtract": TimesFun("subtract", None, None, lambda a, b: a - b),
    "add": TimesFun("add", None, None, lambda a, b: a + b),
    "divide": TimesFun("divide", None, None, lambda a, b: a / b),
    "left": TimesFun("left", None, None, lambda a, b: a),
    "right": TimesFun("right", None, None, lambda a, b: b),
    "and_times": TimesFun(
        "and_times", False, False, lambda a, b: a & b, result_type="BOOLEAN", result_default=False
    ),
    "concat_times": TimesFun(
        "concat_times", None, None, lambda a, b: F.concat(a, b), result_type="STRING"
    ),
}


def plus(name_or_fun: str | PlusFun) -> PlusFun:
    """Resolve a ⊕ monoid by registry name or pass a PlusFun through."""
    if isinstance(name_or_fun, PlusFun):
        return name_or_fun
    try:
        return PLUS[name_or_fun]
    except KeyError:
        raise ValueError(f"unknown PlusFun {name_or_fun!r}; known: {sorted(PLUS)}") from None


def times(name_or_fun: str | TimesFun) -> TimesFun:
    """Resolve a ⊗ function by registry name or pass a TimesFun through."""
    if isinstance(name_or_fun, TimesFun):
        return name_or_fun
    try:
        return TIMES[name_or_fun]
    except KeyError:
        raise ValueError(f"unknown TimesFun {name_or_fun!r}; known: {sorted(TIMES)}") from None
