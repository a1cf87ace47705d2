"""Lara associative-table schema: ordered key attributes → value attributes
with defaults.

Reference semantics (dhutchis/LaraDB):
  - ``Schema(keys, vals)`` with disjoint, duplicate-free names
    (reference: api/Schema.kt:150-160).
  - Key attributes are ordered; the schema is a total order on tuples
    (reference: api/Schema.kt:191-212).
  - Every value attribute carries a default, making tables conceptually
    total over the key space (reference: api/Schema.kt:108-145).

Spark mapping: a ``StructType`` cannot carry defaults, so the schema keeps
them engine-side; operators use them for union/join default semantics
(coalesce-to-default, annihilator checks) at plan-build time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

# Logical types (reference: api/Types.kt:58-140). DATETIME is the Raco type
# the reference declares but never lowers (reference: opt/RacoToAccumulo.kt:34);
# we support it natively via Spark TimestampType.
_LTYPE_TO_SPARK: dict[str, T.DataType] = {
    "LONG": T.LongType(),
    "ULONG": T.LongType(),
    "INT": T.IntegerType(),
    "UINT": T.IntegerType(),
    "DOUBLE": T.DoubleType(),
    "NDOUBLE": T.DoubleType(),
    "FLOAT": T.FloatType(),
    "BOOLEAN": T.BooleanType(),
    "STRING": T.StringType(),
    "DATETIME": T.TimestampType(),
    # Beyond-reference types for the training-data pipeline surface.
    "BINARY": T.BinaryType(),
    "FLOAT_ARRAY": T.ArrayType(T.FloatType()),
    "DOUBLE_ARRAY": T.ArrayType(T.DoubleType()),
    "STRING_ARRAY": T.ArrayType(T.StringType()),
}


def spark_type(ltype: str | T.DataType) -> T.DataType:
    """Map a Lara type name (LONG/STRING/DOUBLE/...) to the Spark type."""
    if isinstance(ltype, T.DataType):
        return ltype
    try:
        return _LTYPE_TO_SPARK[ltype.upper()]
    except KeyError:
        raise ValueError(f"unknown logical type {ltype!r}; known: {sorted(_LTYPE_TO_SPARK)}") from None


@dataclass(frozen=True)
class Attribute:
    """Key attribute (reference: api/Schema.kt:65-106)."""

    name: str
    type: str | T.DataType = "STRING"

    @property
    def spark_type(self) -> T.DataType:
        return spark_type(self.type)


@dataclass(frozen=True)
class ValAttribute:
    """Value attribute with a default (reference: api/Schema.kt:108-145).

    The default is the value a conceptually-total table holds at absent
    keys; union PlusFun identities and join TimesFun annihilators must
    equal it (reference: api/TupleOp.kt:313-319, 649-652).
    """

    name: str
    type: str | T.DataType = "DOUBLE"
    default: Any = None

    @property
    def spark_type(self) -> T.DataType:
        return spark_type(self.type)


@dataclass(frozen=True)
class LaraSchema:
    """Ordered keys → vals with defaults (reference: api/Schema.kt:150-212)."""

    keys: tuple[Attribute, ...]
    vals: tuple[ValAttribute, ...] = field(default_factory=tuple)

    def __post_init__(self) -> None:
        names = self.key_names + self.val_names
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate/overlapping attribute names in schema: {names}")

    @staticmethod
    def of(keys, vals=()) -> "LaraSchema":
        """Coerce ``[('k','STRING'), ...]`` / ``[('v','DOUBLE',0.0), ...]`` forms."""
        katts = tuple(a if isinstance(a, Attribute) else Attribute(*a) for a in keys)
        vatts = tuple(a if isinstance(a, ValAttribute) else ValAttribute(*a) for a in vals)
        return LaraSchema(katts, vatts)

    @property
    def key_names(self) -> list[str]:
        return [a.name for a in self.keys]

    @property
    def val_names(self) -> list[str]:
        return [a.name for a in self.vals]

    @property
    def names(self) -> list[str]:
        return self.key_names + self.val_names

    def defaults(self) -> dict[str, Any]:
        return {a.name: a.default for a in self.vals}

    def val(self, name: str) -> ValAttribute:
        for a in self.vals:
            if a.name == name:
                return a
        raise KeyError(f"no value attribute {name!r} in {self.val_names}")

    def to_struct(self) -> T.StructType:
        fields = [T.StructField(a.name, a.spark_type, nullable=False) for a in self.keys]
        fields += [T.StructField(a.name, a.spark_type, nullable=True) for a in self.vals]
        return T.StructType(fields)

    # --- schema calculus used by Union / Join -------------------------------

    def common_key_prefix(self, other: "LaraSchema") -> list[Attribute]:
        """Longest common prefix of key attribute lists
        (reference: api/TupleOp.kt:374-387 ``intersectKeys``)."""
        out: list[Attribute] = []
        for a, b in zip(self.keys, other.keys):
            if a.name != b.name:
                break
            if spark_type(a.type) != spark_type(b.type):
                raise ValueError(f"key {a.name!r} type mismatch: {a.type} vs {b.type}")
            out.append(a)
        shared = set(self.key_names) & set(other.key_names)
        extra = shared - {a.name for a in out}
        if extra:
            raise ValueError(
                f"shared keys {sorted(extra)} are not a common prefix; "
                f"sort both inputs first (reference: api/TupleOp.kt:383-386)"
            )
        return out

    def union_vals(self, other: "LaraSchema") -> list[ValAttribute]:
        """Union of value attributes; same-named attrs must agree on type and
        default (reference: api/TupleOp.kt:391-400 ``unionValues``)."""
        out = list(self.vals)
        mine = {a.name: a for a in self.vals}
        for b in other.vals:
            a = mine.get(b.name)
            if a is None:
                out.append(b)
            elif spark_type(a.type) != spark_type(b.type) or a.default != b.default:
                raise ValueError(f"value attr {b.name!r} differs between parents: {a} vs {b}")
        return out

    def union_keys_prefix(self, other: "LaraSchema") -> list[Attribute]:
        """Key union for Join: shared keys must be a common prefix of both;
        result = shared ++ self-only ++ other-only
        (reference: api/TupleOp.kt:625-640 ``unionKeys``)."""
        shared = set(self.key_names) & set(other.key_names)
        n = len(shared)
        for sch in (self, other):
            prefix = {a.name for a in sch.keys[:n]}
            if prefix != shared:
                raise ValueError(
                    f"join requires shared keys {sorted(shared)} to be a common key "
                    f"prefix of both parents; got {sch.key_names}"
                )
        for a, b in zip(self.keys[:n], other.keys[:n]):
            if spark_type(a.type) != spark_type(b.type):
                raise ValueError(f"join key {a.name} type mismatch")
        out = list(self.keys)
        seen = set(self.key_names)
        out += [b for b in other.keys if b.name not in seen]
        return out

    def intersect_val_names(self, other: "LaraSchema") -> list[str]:
        """Join result vals = intersection (reference: api/TupleOp.kt:642-658)."""
        other_names = set(other.val_names)
        return [a.name for a in self.vals if a.name in other_names]
