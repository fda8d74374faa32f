"""Pure-Python predicate evaluation for SparkSession-free planning.

The batch facade (sources/batch_source.py) plans in a plain Python worker,
so its predicate pushdown cannot use Spark columns. This module gives the
typed AST (plans/expressions.py, produced by plans/sql_parser.py) three
SparkSession-free backends:

* :func:`eval_3vl` — Kleene three-valued evaluation over a partial row
  (partition values): True/False/None, where None means "unknown — cannot
  prune". Drives exact partition pruning at planning time.
* :func:`substitute` — replace partition-column references with their
  per-file literal values, so the residual can compile per file.
* :func:`to_arrow_expr` — compile to a ``pyarrow.dataset`` Expression for
  executor-side row filtering; pyarrow applies it with row-group
  statistics pruning, mirroring what Catalyst's parquet pushdown does
  JVM-side. Raises :class:`UnsupportedPredicate` for nodes pyarrow cannot
  express — callers must treat the predicate as all-or-nothing (returning
  unfiltered rows under a predicate option would be silently wrong).

Semantics contract: the same 3VL the Spark side implements
(plans/expressions.py to_spark) — comparisons with NULL are unknown,
And/Or are Kleene, NOT(unknown)=unknown.
"""

from __future__ import annotations

import datetime as _dt
from decimal import Decimal, InvalidOperation
from typing import Any

from delta_kernel_rs_spark.plans.expressions import (
    And,
    Arith,
    BoolLiteral,
    Coalesce,
    Col,
    Compare,
    Distinct,
    In,
    IsNotNull,
    IsNull,
    Like,
    Literal,
    Not,
    NotDistinct,
    Or,
    Predicate,
)

_UNKNOWN = object()  # expression value is not computable from the partial row


class UnsupportedPredicate(Exception):
    pass


# ---------------------------------------------------------------------------
# Literal coercion against a table schema
#
# The SQL parser types literals lexically (a quoted token is a Python str
# even when it compares against a DateType partition column), while
# partition values are parsed to their column's Python type. Raw Python
# cross-type equality silently returns False (date == str), which would
# make pruning *wrongly drop files*. Callers coerce the AST's literals to
# the referenced column's type once, up front; anything unconvertible
# raises here rather than mis-pruning later.


def _coerce_value(v: Any, dt) -> Any:
    """Convert a parsed literal to column type ``dt``'s Python domain.

    Only conversions with exact Spark-cast semantics are applied (string →
    date/timestamp/numeric/bool, date → timestamp midnight); numerics stay
    untouched because Python compares int/float/Decimal exactly. Raises
    UnsupportedPredicate when the literal cannot represent a value of the
    column's type — Spark would cast it to NULL, so the caller must not
    fall back to a raw comparison."""
    from pyspark.sql import types as T

    if v is None:
        return None
    try:
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            if isinstance(v, str):
                return int(v.strip())
            return v
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            if isinstance(v, str):
                return float(v.strip())
            if isinstance(v, Decimal):
                # Spark promotes decimal to double when compared against a
                # float column; exact-Decimal comparison would diverge (a
                # file whose max IS the promoted double would be skipped by
                # ``f = 0.1BD`` — caught by tests/test_skipping_fuzz.py)
                return float(v)
            return v
        if isinstance(dt, T.DecimalType):
            if isinstance(v, str):
                return Decimal(v.strip())
            return v
        if isinstance(dt, T.BooleanType):
            if isinstance(v, str):
                low = v.strip().lower()
                if low in ("true", "false"):
                    return low == "true"
                raise ValueError(v)
            return v
        if isinstance(dt, T.DateType):
            if isinstance(v, str):
                return _dt.date.fromisoformat(v.strip())
            return v
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            if isinstance(v, str):
                return _dt.datetime.fromisoformat(v.strip())
            if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                return _dt.datetime(v.year, v.month, v.day)
            return v
    except (ValueError, InvalidOperation):
        raise UnsupportedPredicate(
            f"literal {v!r} is not castable to column type {dt.simpleString()}"
        ) from None
    return v


def coerce_literals(p: Predicate, schema) -> Predicate:
    """Rewrite ``p`` so every literal compared against a schema column is in
    that column's Python domain (see module note). ``schema`` is the table's
    logical StructType; nested struct fields resolve by dotted path."""
    from pyspark.sql import types as T

    types: dict[str, Any] = {}

    def collect(prefix: str, st) -> None:
        for f in st.fields:
            path = f"{prefix}{f.name}"
            types[path] = f.dataType
            if isinstance(f.dataType, T.StructType):
                collect(path + ".", f.dataType)

    collect("", schema)

    def col_type(e):
        return types.get(e.path) if isinstance(e, Col) else None

    def fix_pair(a, b):
        ta, tb = col_type(a), col_type(b)
        if ta is not None and isinstance(b, Literal):
            b = Literal(_coerce_value(b.value, ta))
        if tb is not None and isinstance(a, Literal):
            a = Literal(_coerce_value(a.value, tb))
        return a, b

    def walk(node: Predicate) -> Predicate:
        if isinstance(node, Compare):
            a, b = fix_pair(node.left, node.right)
            return Compare(node.op, a, b)
        if isinstance(node, (Distinct, NotDistinct)):
            a, b = fix_pair(node.left, node.right)
            return type(node)(a, b)
        if isinstance(node, In):
            t = col_type(node.expr)
            if t is not None:
                return In(node.expr, tuple(_coerce_value(v, t) for v in node.values))
            return node
        if isinstance(node, And):
            return And(tuple(walk(c) for c in node.children))
        if isinstance(node, Or):
            return Or(tuple(walk(c) for c in node.children))
        if isinstance(node, Not):
            return Not(walk(node.child))
        return node

    return walk(p)


def _py_comparable(a: Any, b: Any) -> bool:
    """Whether raw Python comparison of ``a`` and ``b`` has SQL semantics.

    bool is an int subclass and datetime a date subclass, so both need
    explicit handling; mixed families (date vs str, int vs str) must NOT
    compare raw — Python eq would return a silently-wrong False."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    num = (int, float, Decimal)
    if isinstance(a, num) and isinstance(b, num):
        return True
    if isinstance(a, _dt.datetime) or isinstance(b, _dt.datetime):
        return isinstance(a, _dt.datetime) and isinstance(b, _dt.datetime)
    if isinstance(a, _dt.date) and isinstance(b, _dt.date):
        return True
    return type(a) is type(b)


# ---------------------------------------------------------------------------
# 3VL evaluation over a partial row


def _eval_expr(e, row: dict[str, Any], known: set[str]):
    """Expression value; _UNKNOWN when it depends on absent columns,
    None for SQL NULL."""
    if isinstance(e, Literal):
        return e.value
    if isinstance(e, Col):
        return row.get(e.path) if e.path in known else _UNKNOWN
    if isinstance(e, Arith):
        a = _eval_expr(e.left, row, known)
        b = _eval_expr(e.right, row, known)
        if a is _UNKNOWN or b is _UNKNOWN:
            return _UNKNOWN
        if a is None or b is None:
            return None
        try:
            if e.op == "plus":
                return a + b
            if e.op == "minus":
                return a - b
            if e.op == "multiply":
                return a * b
            if e.op == "divide":
                return None if b == 0 else a / b
            if e.op == "mod":
                return None if b == 0 else a % b
        except TypeError:
            return _UNKNOWN
        return _UNKNOWN
    if isinstance(e, Coalesce):
        for child in e.exprs:
            v = _eval_expr(child, row, known)
            if v is _UNKNOWN:
                return _UNKNOWN
            if v is not None:
                return v
        return None
    return _UNKNOWN


_CMP = {
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
}


def eval_3vl(p: Predicate, row: dict[str, Any], known: set[str]) -> bool | None:
    """Kleene evaluation; None = unknown (e.g. references a data column)."""
    if isinstance(p, BoolLiteral):
        return p.value
    if isinstance(p, Compare):
        a = _eval_expr(p.left, row, known)
        b = _eval_expr(p.right, row, known)
        if a is _UNKNOWN or b is _UNKNOWN:
            return None
        if a is None or b is None:
            return None  # SQL NULL comparison
        if not _py_comparable(a, b):
            return None  # cross-type: unknown, never a silent False
        try:
            return bool(_CMP[p.op](a, b))
        except TypeError:
            return None
    if isinstance(p, IsNull):
        v = _eval_expr(p.expr, row, known)
        return None if v is _UNKNOWN else v is None
    if isinstance(p, IsNotNull):
        v = _eval_expr(p.expr, row, known)
        return None if v is _UNKNOWN else v is not None
    if isinstance(p, (Distinct, NotDistinct)):
        a = _eval_expr(p.left, row, known)
        b = _eval_expr(p.right, row, known)
        if a is _UNKNOWN or b is _UNKNOWN:
            return None
        if a is not None and b is not None and not _py_comparable(a, b):
            return None
        try:
            same = (a is None and b is None) or (
                a is not None and b is not None and a == b
            )
        except TypeError:
            return None
        return (not same) if isinstance(p, Distinct) else same
    if isinstance(p, In):
        v = _eval_expr(p.expr, row, known)
        if v is _UNKNOWN:
            return None
        if v is None:
            return None
        vals = [x for x in p.values if x is not None]
        incomparable = False
        for x in vals:
            if not _py_comparable(v, x):
                incomparable = True
                continue
            try:
                if v == x:
                    return True
            except TypeError:
                incomparable = True
        if incomparable:
            return None
        return None if len(vals) != len(p.values) else False  # NULL in list
    if isinstance(p, Like):
        if "\\" in p.pattern:
            return None  # escape semantics not modeled — never prune
        v = _eval_expr(p.expr, row, known)
        if v is _UNKNOWN or v is None:
            return None
        if not isinstance(v, str):
            return None
        return _like_match(p.pattern, v)
    if isinstance(p, And):
        verdicts = [eval_3vl(c, row, known) for c in p.children]
        if any(v is False for v in verdicts):
            return False
        if any(v is None for v in verdicts):
            return None
        return True
    if isinstance(p, Or):
        verdicts = [eval_3vl(c, row, known) for c in p.children]
        if any(v is True for v in verdicts):
            return True
        if any(v is None for v in verdicts):
            return None
        return False
    if isinstance(p, Not):
        v = eval_3vl(p.child, row, known)
        return None if v is None else (not v)
    return None  # opaque / unknown node kinds cannot prune


def _like_match(pattern: str, value: str) -> bool:
    """SQL LIKE (%, _) as a full-string regex match; DOTALL so wildcards
    cross newlines, matching Spark/SQL semantics."""
    import re

    rx = "".join(
        ".*" if ch == "%" else "." if ch == "_" else re.escape(ch) for ch in pattern
    )
    return re.fullmatch(rx, value, flags=re.DOTALL) is not None


# ---------------------------------------------------------------------------
# Partition-column substitution (per-file residual)


def substitute(p: Predicate, row: dict[str, Any], known: set[str]) -> Predicate:
    """Replace references to ``known`` columns with their literal values."""

    def sub_e(e):
        if isinstance(e, Col) and e.path in known:
            return Literal(row.get(e.path))
        if isinstance(e, Arith):
            return Arith(e.op, sub_e(e.left), sub_e(e.right))
        if isinstance(e, Coalesce):
            return Coalesce(tuple(sub_e(c) for c in e.exprs))
        return e

    if isinstance(p, Compare):
        return Compare(p.op, sub_e(p.left), sub_e(p.right))
    if isinstance(p, IsNull):
        return IsNull(sub_e(p.expr))
    if isinstance(p, IsNotNull):
        return IsNotNull(sub_e(p.expr))
    if isinstance(p, Distinct):
        return Distinct(sub_e(p.left), sub_e(p.right))
    if isinstance(p, NotDistinct):
        return NotDistinct(sub_e(p.left), sub_e(p.right))
    if isinstance(p, In):
        return In(sub_e(p.expr), p.values)
    if isinstance(p, Like):
        return Like(sub_e(p.expr), p.pattern)
    if isinstance(p, And):
        return And(tuple(substitute(c, row, known) for c in p.children))
    if isinstance(p, Or):
        return Or(tuple(substitute(c, row, known) for c in p.children))
    if isinstance(p, Not):
        return Not(substitute(p.child, row, known))
    return p


# ---------------------------------------------------------------------------
# pyarrow dataset Expression compilation


def to_arrow_expr(p: Predicate, name_map: dict[str, str] | None = None):
    """Compile to a pyarrow Expression (logical → physical names via
    ``name_map``). Raises UnsupportedPredicate for inexpressible nodes."""
    import pyarrow.dataset as pads

    nm = name_map or {}

    def field(path: str):
        if "." in path:
            # nested references are resolvable, but physical renames for
            # nested fields are not modeled here — refuse rather than
            # silently misread
            raise UnsupportedPredicate(f"nested column reference: {path}")
        return pads.field(nm.get(path, path))

    def expr(e):
        if isinstance(e, Literal):
            import pyarrow as pa

            return pads.scalar(e.value) if e.value is not None else pads.scalar(
                pa.scalar(None)
            )
        if isinstance(e, Col):
            return field(e.path)
        if isinstance(e, Arith):
            a, b = expr(e.left), expr(e.right)
            if e.op == "plus":
                return a + b
            if e.op == "minus":
                return a - b
            if e.op == "multiply":
                return a * b
            if e.op == "divide":
                return a / b
            raise UnsupportedPredicate(f"arithmetic op {e.op}")
        raise UnsupportedPredicate(f"expression node {type(e).__name__}")

    if isinstance(p, BoolLiteral):
        if p.value is None:
            raise UnsupportedPredicate("NULL boolean literal")
        return pads.scalar(bool(p.value))
    if isinstance(p, Compare):
        a, b = expr(p.left), expr(p.right)
        return {
            "lt": a < b,
            "le": a <= b,
            "gt": a > b,
            "ge": a >= b,
            "eq": a == b,
            "ne": a != b,
        }[p.op]
    if isinstance(p, IsNull):
        return expr(p.expr).is_null()
    if isinstance(p, IsNotNull):
        return expr(p.expr).is_valid()
    if isinstance(p, NotDistinct):
        a, b = expr(p.left), expr(p.right)
        return (a == b) | (a.is_null() & b.is_null())
    if isinstance(p, Distinct):
        a, b = expr(p.left), expr(p.right)
        return ~((a == b) | (a.is_null() & b.is_null()))
    if isinstance(p, In):
        if any(v is None for v in p.values):
            # a NULL in the list makes every non-match UNKNOWN; that is not
            # representable as a bare isin, and "drop the NULL" flips the
            # verdict under an enclosing NOT — refuse instead
            raise UnsupportedPredicate("IN list containing NULL")
        return expr(p.expr).isin(list(p.values))
    if isinstance(p, Like):
        import pyarrow.compute as pc

        return pc.match_like(expr(p.expr), p.pattern)
    if isinstance(p, And):
        out = to_arrow_expr(p.children[0], nm)
        for c in p.children[1:]:
            out = out & to_arrow_expr(c, nm)
        return out
    if isinstance(p, Or):
        out = to_arrow_expr(p.children[0], nm)
        for c in p.children[1:]:
            out = out | to_arrow_expr(c, nm)
        return out
    if isinstance(p, Not):
        return ~to_arrow_expr(p.child, nm)
    raise UnsupportedPredicate(f"predicate node {type(p).__name__}")
