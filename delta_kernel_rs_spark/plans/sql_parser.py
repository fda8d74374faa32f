"""SQL predicate string → typed Predicate AST.

The engine's most natural API is a string predicate
(``table.to_df(predicate="l_quantity <= 25")``). Parsing it into the
typed AST (plans/expressions.py) is what unlocks file skipping and
partition pruning for that API — a raw string can only ever be a residual
row filter (reference parses SQL predicates the same way:
workloads/src/predicate_parser.rs:1-41 — comparisons, AND/OR/NOT, IN,
IS [NOT] NULL, BETWEEN; literal parser kernel/src/expressions/sql.rs:1-54).

Grammar (case-insensitive keywords)::

    pred    := and_or                        -- OR lowest, AND next, NOT unary
    atom    := operand cmp operand
             | operand IS [NOT] NULL
             | operand IS [NOT] DISTINCT FROM operand | operand <=> operand
             | operand [NOT] IN '(' literal, ... ')'
             | operand [NOT] BETWEEN operand AND operand
             | operand [NOT] LIKE 'pattern'
             | TRUE | FALSE | '(' pred ')'
    operand := arithmetic over columns / literals ( + - * / % , '(' ')' )
    literal := number | 'string' | TRUE | FALSE | NULL
             | DATE 'yyyy-mm-dd' | TIMESTAMP 'yyyy-mm-dd hh:mm:ss[.ffffff]'
    column  := ident(.ident)* | `backtick quoted`

Anything outside this grammar (functions, subqueries, ...) raises
:class:`SqlParseError`; callers fall back to ``F.expr`` — losing skipping
but never correctness (the residual row filter always re-applies the
user's predicate verbatim).

``to_spark()`` of the parsed AST lowers to exactly the Column operations
Catalyst would build for the same SQL, so swapping the string path for the
parsed path cannot change results — only prune more files.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any

from delta_kernel_rs_spark.plans.expressions import (
    And,
    Arith,
    BoolLiteral,
    Col,
    Compare,
    Expr,
    In,
    IsNotNull,
    IsNull,
    Like,
    Literal,
    Not,
    NotDistinct,
    Distinct,
    Or,
    Predicate,
)


class SqlParseError(ValueError):
    """The string is outside the supported predicate grammar."""


_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<str>'(?:[^']|'')*')
    | (?P<bq>`(?:[^`]|``)+`)
    | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
    | (?P<op><=>|<=|>=|<>|!=|=|<|>|\(|\)|,|\.|\+|-|\*|/|%)
    )""",
    re.VERBOSE,
)

_CMP_OPS = {"<": "lt", "<=": "le", ">": "gt", ">=": "ge", "=": "eq", "<>": "ne", "!=": "ne"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            rest = text[pos:].strip()
            if not rest:
                break
            raise SqlParseError(f"unexpected input at {rest[:20]!r}")
        pos = m.end()
        for kind in ("num", "str", "bq", "ident", "op"):
            v = m.group(kind)
            if v is not None:
                tokens.append((kind, v))
                break
    return tokens


class _Parser:
    def __init__(
        self, tokens: list[tuple[str, str]], bool_columns: set[str] | None = None
    ):
        self.toks = tokens
        self.i = 0
        self.bool_columns = bool_columns

    # -- token helpers ----------------------------------------------------
    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def accept_op(self, *ops: str) -> str | None:
        t = self.peek()
        if t and t[0] == "op" and t[1] in ops:
            self.i += 1
            return t[1]
        return None

    def expect_op(self, op: str) -> None:
        if self.accept_op(op) is None:
            raise SqlParseError(f"expected {op!r} at token {self.i}")

    def accept_kw(self, *kws: str) -> str | None:
        t = self.peek()
        if t and t[0] == "ident" and t[1].upper() in kws:
            self.i += 1
            return t[1].upper()
        return None

    def expect_kw(self, kw: str) -> None:
        if self.accept_kw(kw) is None:
            raise SqlParseError(f"expected keyword {kw}")

    # -- predicate grammar --------------------------------------------------
    def parse(self) -> Predicate:
        p = self.parse_or()
        if self.i != len(self.toks):
            raise SqlParseError(f"trailing tokens from {self.toks[self.i]}")
        return p

    def parse_or(self) -> Predicate:
        children = [self.parse_and()]
        while self.accept_kw("OR"):
            children.append(self.parse_and())
        return children[0] if len(children) == 1 else Or(tuple(children))

    def parse_and(self) -> Predicate:
        children = [self.parse_unary()]
        while self.accept_kw("AND"):
            children.append(self.parse_unary())
        return children[0] if len(children) == 1 else And(tuple(children))

    def parse_unary(self) -> Predicate:
        if self.accept_kw("NOT"):
            return Not(self.parse_unary())
        pos = self.i
        if self.accept_op("("):
            # '(' opens either a predicate group or an operand — try the
            # predicate first; on failure rewind and parse as an atom.
            try:
                p = self.parse_or()
                self.expect_op(")")
                return p
            except SqlParseError:
                self.i = pos
        return self.parse_atom()

    def parse_atom(self) -> Predicate:
        if self.accept_kw("TRUE"):
            return BoolLiteral(True)
        if self.accept_kw("FALSE"):
            return BoolLiteral(False)
        left = self.parse_operand()

        if self.accept_kw("IS"):
            neg = self.accept_kw("NOT") is not None
            if self.accept_kw("NULL"):
                return IsNotNull(left) if neg else IsNull(left)
            if self.accept_kw("DISTINCT"):
                self.expect_kw("FROM")
                right = self.parse_operand()
                return NotDistinct(left, right) if neg else Distinct(left, right)
            raise SqlParseError("expected NULL or DISTINCT FROM after IS")

        neg = self.accept_kw("NOT") is not None
        if self.accept_kw("IN"):
            self.expect_op("(")
            values = [self.parse_literal_value()]
            while self.accept_op(","):
                values.append(self.parse_literal_value())
            self.expect_op(")")
            p: Predicate = In(left, tuple(values))
            return Not(p) if neg else p
        if self.accept_kw("BETWEEN"):
            lo = self.parse_operand()
            self.expect_kw("AND")
            hi = self.parse_operand()
            p = And((Compare("ge", left, lo), Compare("le", left, hi)))
            return Not(p) if neg else p
        if self.accept_kw("LIKE"):
            t = self.peek()
            if t is None or t[0] != "str":
                raise SqlParseError("expected a string literal after LIKE")
            self.i += 1
            p = Like(left, self._str(t[1]))
            return Not(p) if neg else p
        if neg:
            raise SqlParseError("expected IN, BETWEEN or LIKE after NOT")

        if self.accept_op("<=>"):
            # Spark's null-safe equality — same node as IS NOT DISTINCT FROM
            return NotDistinct(left, self.parse_operand())
        t = self.peek()
        if t and t[0] == "op" and t[1] in _CMP_OPS:
            self.i += 1
            right = self.parse_operand()
            return Compare(_CMP_OPS[t[1]], left, right)

        # A bare boolean column / literal used as a predicate. The implicit
        # `= TRUE` is only sound when the column is KNOWN boolean — for an
        # int column it would prune files via boolean-cast stats while the
        # residual F.expr fails analysis; stay residual-only instead.
        if isinstance(left, Literal) and isinstance(left.value, bool):
            return BoolLiteral(left.value)
        if isinstance(left, Col):
            if self.bool_columns is not None and left.path in self.bool_columns:
                return Compare("eq", left, Literal(True))
            raise SqlParseError(
                f"bare column {left.path!r} is not a known boolean column"
            )
        raise SqlParseError("expected a comparison operator")

    # -- operand grammar ----------------------------------------------------
    def parse_operand(self) -> Expr:
        left = self.parse_mul()
        while True:
            op = self.accept_op("+", "-")
            if op is None:
                return left
            left = Arith("plus" if op == "+" else "minus", left, self.parse_mul())

    def parse_mul(self) -> Expr:
        left = self.parse_term()
        while True:
            op = self.accept_op("*", "/", "%")
            if op is None:
                return left
            name = {"*": "multiply", "/": "divide", "%": "mod"}[op]
            left = Arith(name, left, self.parse_term())

    def parse_term(self) -> Expr:
        if self.accept_op("-"):
            inner = self.parse_term()
            if isinstance(inner, Literal) and isinstance(inner.value, (int, float)):
                return Literal(-inner.value)
            return Arith("minus", Literal(0), inner)
        if self.accept_op("("):
            e = self.parse_operand()
            self.expect_op(")")
            return e
        t = self.peek()
        if t is None:
            raise SqlParseError("unexpected end of input")
        kind, text = t
        if kind == "num":
            self.i += 1
            return Literal(self._num(text))
        if kind == "str":
            self.i += 1
            return Literal(self._str(text))
        if kind == "bq":
            self.i += 1
            return Col(text[1:-1].replace("``", "`"))
        if kind == "ident":
            upper = text.upper()
            if upper in ("TRUE", "FALSE"):
                self.i += 1
                return Literal(upper == "TRUE")
            if upper == "NULL":
                self.i += 1
                return Literal(None)
            if upper in ("DATE", "TIMESTAMP"):
                nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
                if nxt and nxt[0] == "str":
                    self.i += 2
                    raw = self._str(nxt[1])
                    if upper == "DATE":
                        return Literal(_dt.date.fromisoformat(raw))
                    return Literal(_dt.datetime.fromisoformat(raw))
            # dotted column path
            self.i += 1
            parts = [text]
            while self.accept_op("."):
                nt = self.peek()
                if nt is None or nt[0] not in ("ident", "bq"):
                    raise SqlParseError("expected identifier after '.'")
                parts.append(nt[1] if nt[0] == "ident" else nt[1][1:-1])
                self.i += 1
            if self.peek() and self.peek()[0] == "op" and self.peek()[1] == "(":
                raise SqlParseError(f"function calls not supported: {text}")
            return Col(".".join(parts))
        raise SqlParseError(f"unexpected token {text!r}")

    def parse_literal_value(self) -> Any:
        e = self.parse_term()
        if not isinstance(e, Literal):
            raise SqlParseError("IN list elements must be literals")
        return e.value

    @staticmethod
    def _num(text: str) -> int | float:
        if "." in text or "e" in text or "E" in text:
            return float(text)
        return int(text)

    @staticmethod
    def _str(text: str) -> str:
        return text[1:-1].replace("''", "'")


def parse_sql_predicate(text: str, schema=None) -> Predicate:
    """Parse ``text`` into a Predicate AST; raises SqlParseError outside
    the supported grammar (callers fall back to ``F.expr``).

    ``schema`` (optional StructType) is only consulted to validate bare
    boolean-column predicates (``predicate="flag"``)."""
    return _Parser(_tokenize(text), _bool_columns(schema)).parse()


def _bool_columns(schema) -> set[str] | None:
    if schema is None:
        return None
    from pyspark.sql import types as T

    return {f.name for f in schema.fields if isinstance(f.dataType, T.BooleanType)}


def try_parse_sql_predicate(text: str, schema=None) -> Predicate | None:
    try:
        return parse_sql_predicate(text, schema)
    except SqlParseError:
        return None
