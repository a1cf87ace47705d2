"""Raco logical-plan importer — the reference's "SQL path" front door.

The reference parses Python-``repr`` strings of UW Raco/Myria logical plans
(produced by ``myrial -L -r``) and compiles them onto Accumulo iterators
(reference: opt/raco/PTree.kt:27-86 parser; opt/raco/RacoOperators.kt:110-222
node decoding; opt/RacoToAccumulo.kt:363-683 lowering). Here the same plan
format compiles to a DataFrame plan — Catalyst replaces the whole lowering
layer, so ``Select`` becomes a pushed-down filter instead of a hand-built
seek range (reference: opt/RacoToAccumulo.kt:541-643).

Supported nodes (the reference's full inventory, RacoOperators.kt:118-222):
  Store(RelationKey, input) · Dump(input) · Apply([(name, expr)…], input)
  FileScan(file, 'CSV', Scheme, {opts}) · FileStore(file, 'CSV', {opts}, input)
  Select(cond, input) · Scan(RelationKey, Scheme, cardinality, RepProps)
Expressions: NamedAttributeRef · UnnamedAttributeRef · NumericLiteral ·
  StringLiteral · PLUS · DIVIDE · GT
(the reference's complete scalar language — SURVEY.md §2.2).

This is a fidelity surface: it exists so reference users' exported plans
run unchanged. New queries should use spark.sql / DataFrame directly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Python-repr parser (the reference's PTree, reference: opt/raco/PTree.kt)
# --------------------------------------------------------------------------

@dataclass
class Node:
    name: str
    args: list


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<name>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<num>-?\d+\.\d*(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+|-?\d+)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<punct>[()\[\]{},:])
    )""",
    re.VERBOSE,
)


def _tokenize(s: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            if s[i].isspace():
                i += 1
                continue
            raise ValueError(f"raco parse error at {i}: {s[i:i+30]!r}")
        out.append(m.group().strip())
        i = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise ValueError(
                "raco parse: unexpected end of input (unbalanced parentheses/brackets?)"
            )
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got != t:
            raise ValueError(f"raco parse: expected {t!r}, got {got!r}")

    def value(self) -> Any:
        t = self.next()
        if t == "[":
            return self._seq("]")
        if t == "(":
            items = self._seq(")")
            return tuple(items)
        if t == "{":
            d = {}
            while self.peek() != "}":
                k = self.value()
                self.expect(":")
                d[k] = self.value()
                if self.peek() == ",":
                    self.next()
            self.next()
            return d
        if t[0] in "'\"":
            return t[1:-1].replace("\\'", "'").replace('\\"', '"')
        if re.fullmatch(r"-?\d+", t):
            return int(t)
        if re.fullmatch(r"-?\d+(\.\d*)?([eE][+-]?\d+)?", t):
            return float(t)
        # bare name: None/True/False, or Node(args)
        if t == "None":
            return None
        if t == "True":
            return True
        if t == "False":
            return False
        if self.peek() == "(":
            self.next()
            return Node(t, self._seq(")"))
        return Node(t, [])

    def _seq(self, close: str) -> list:
        items = []
        while self.peek() != close:
            items.append(self.value())
            if self.peek() == ",":
                self.next()
        self.next()
        return items


def parse_raco(repr_str: str) -> Any:
    """Parse a Raco physical-plan repr string into a PTree (reference: raco printed plans)."""
    p = _Parser(_tokenize(repr_str))
    v = p.value()
    if p.peek() is not None:
        raise ValueError(f"raco parse: trailing tokens at {p.i}: {p.toks[p.i:p.i+5]}")
    return v


# --------------------------------------------------------------------------
# Compiler: Node tree → DataFrame plan
# --------------------------------------------------------------------------

_RACO_TYPES = {
    "LONG": T.LongType(),
    "INT": T.IntegerType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT": T.FloatType(),
    "STRING": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "DATETIME": T.TimestampType(),  # declared-but-unsupported in the
    # reference (opt/RacoToAccumulo.kt:34); native here.
}


def _scheme_fields(scheme: Node) -> list[tuple[str, T.DataType]]:
    if scheme.name != "Scheme" or len(scheme.args) != 1:
        raise ValueError(f"expected Scheme([...]), got {scheme}")
    out = []
    for name, tname in scheme.args[0]:
        t = tname[:-5] if tname.endswith("_TYPE") else tname
        out.append((name, _RACO_TYPES[t]))
    return out


@dataclass
class RacoPlan:
    """Compiled plan: the result DataFrame plus the sink described by the
    plan root (Store/FileStore/Dump)."""

    df: DataFrame
    sink: str | None = None  # 'table:<name>' | 'file:<path>' | None (Dump)

    def run(self) -> DataFrame:
        """Execute the sink action (reference executes via
        AccumuloPipelineTask, opt/Execute.kt:10-27)."""
        if self.sink is None:
            return self.df
        kind, _, target = self.sink.partition(":")
        if kind == "table":
            self.df.write.mode("overwrite").saveAsTable(target)
        elif kind == "file":
            from ..sources.csv_io import write_csv

            write_csv(self.df, target, header=True)
        return self.df


class RacoCompiler:
    """Compile parsed Raco trees to DataFrame plans.

    ``catalog`` maps RelationKey relation names to DataFrames (the
    reference binds Scan to Accumulo tables via AccumuloConfig)."""

    def __init__(self, spark: SparkSession, catalog: dict[str, DataFrame] | None = None):
        self.spark = spark
        self.catalog = catalog or {}

    def compile(self, plan: str | Node) -> RacoPlan:
        node = parse_raco(plan) if isinstance(plan, str) else plan
        return self._op(node)

    # --- operators ---------------------------------------------------------

    def _op(self, n: Node) -> RacoPlan:
        if not isinstance(n, Node):
            raise ValueError(f"expected operator node, got {n!r}")
        if n.name == "Store":
            rel = self._relation_key(n.args[0])
            child = self._op(n.args[1])
            return RacoPlan(child.df, sink=f"table:{rel}")
        if n.name == "FileStore":
            path, fmt, _opts, child_n = n.args
            child = self._op(child_n)
            return RacoPlan(child.df, sink=f"file:{_strip_file_uri(path)}")
        if n.name == "Dump":
            return RacoPlan(self._op(n.args[0]).df)
        if n.name == "Apply":
            emitters, child_n = n.args
            child = self._op(child_n)
            cols = [
                self._expr(e, child.df).alias(name) for name, e in emitters
            ]
            return RacoPlan(child.df.select(*cols))
        if n.name == "Select":
            cond_n, child_n = n.args
            child = self._op(child_n)
            return RacoPlan(child.df.filter(self._expr(cond_n, child.df)))
        if n.name == "FileScan":
            path, fmt, scheme, opts = n.args
            if fmt.upper() != "CSV":
                raise ValueError(f"FileScan format {fmt!r} unsupported (reference: CSV only)")
            fields = _scheme_fields(scheme)
            struct = T.StructType([T.StructField(f, t, True) for f, t in fields])
            from ..sources.csv_io import read_csv

            skip = int(opts.get("skip", 0)) if isinstance(opts, dict) else 0
            return RacoPlan(read_csv(self.spark, _strip_file_uri(path), struct, skip=skip))
        if n.name == "Scan":
            rel = self._relation_key(n.args[0])
            if rel in self.catalog:
                return RacoPlan(self.catalog[rel])
            return RacoPlan(self.spark.table(rel))
        raise ValueError(f"unsupported Raco operator {n.name!r}")

    def _relation_key(self, n: Node) -> str:
        if n.name != "RelationKey":
            raise ValueError(f"expected RelationKey, got {n}")
        return n.args[2]  # (user, program, relation) → relation name

    # --- expressions (reference: opt/raco/RacoOperators.kt:19-95) -----------

    def _expr(self, e: Any, df: DataFrame) -> Column:
        if isinstance(e, Node):
            if e.name == "NamedAttributeRef":
                return F.col(e.args[0])
            if e.name == "UnnamedAttributeRef":
                return F.col(df.columns[e.args[0]])
            if e.name == "NumericLiteral":
                return F.lit(e.args[0])
            if e.name == "StringLiteral":
                return F.lit(e.args[0])
            if e.name == "PLUS":
                a, b = (self._expr(x, df) for x in e.args)
                # string PLUS = concat; boolean PLUS = || (reference:
                # RacoToAccumulo.kt:71-126)
                if self._is_string(e.args[0], df) and self._is_string(e.args[1], df):
                    return F.concat(a, b)
                if self._type_of(e.args[0], df) == "boolean":
                    return a | b
                return a + b
            if e.name == "DIVIDE":
                a, b = (self._expr(x, df) for x in e.args)
                # LONG/LONG stays LONG in the reference (integer division,
                # RacoToAccumulo.kt:128-213); mixed upcasts to double.
                # Integral `div` (truncating, exact at any magnitude) — a
                # double-divide-then-cast mis-rounds past 2^53.
                if self._is_long(e.args[0], df) and self._is_long(e.args[1], df):
                    return F.call_function("div", a.cast("long"), b.cast("long"))
                return a / b
            if e.name == "GT":
                a, b = (self._expr(x, df) for x in e.args)
                return a > b
        raise ValueError(f"unsupported Raco expression {e!r}")

    def _type_of(self, e: Any, df: DataFrame) -> str | None:
        if isinstance(e, Node):
            if e.name == "NamedAttributeRef":
                return dict(df.dtypes).get(e.args[0])
            if e.name == "UnnamedAttributeRef":
                return df.dtypes[e.args[0]][1]
            if e.name == "NumericLiteral":
                return "bigint" if isinstance(e.args[0], int) else "double"
            if e.name == "StringLiteral":
                return "string"
        return None

    def _is_string(self, e: Any, df: DataFrame) -> bool:
        return self._type_of(e, df) == "string"

    def _is_long(self, e: Any, df: DataFrame) -> bool:
        return self._type_of(e, df) in ("bigint", "int", "long")


def _strip_file_uri(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path
