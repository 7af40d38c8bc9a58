"""OTTL-style condition expressions → vectorized predicates.

The reference's transform/filter processors take STRING conditions
(OTTL: ``attributes["level"] == "ERROR" and latency_ms > 100`` —
docs/processing.md:100-148); this repo's filter/attributes stages take
structured (col, op, value) triples. This module closes the gap: a
tiny recursive-descent parser compiles a condition string into the
SAME vectorized `filters._mask` primitives (one Arrow kernel per
comparison, combined with ``and_kleene``/``or_kleene``/``invert``) —
parsed once, evaluated per batch, zero per-row Python.

Grammar::

    expr   := and_e ('or' and_e)*
    and_e  := not_e ('and' not_e)*
    not_e  := 'not' not_e | '(' expr ')' | cmp
    cmp    := colref OP literal
            | colref 'in' '(' literal (',' literal)* ')'
            | colref 'matches' STRING
    colref := IDENT | IDENT '[' STRING ']'   -- map-column subscript
    OP     := '==' '!=' '>' '>=' '<' '<='
    literal:= 'single-quoted string' | int | float | true | false

SQL mirror: ``==`` → ``=``; everything else reads identically, so an
oracle WHERE clause can be written by inspection.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .filters import _mask
from .maps import map_get

_TOKEN = re.compile(
    r"\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)"
    r"|(?P<lbracket>\[)|(?P<rbracket>\])"
    r"|(?P<op>==|!=|>=|<=|>|<)"
    r"|(?P<str>'(?:[^'\\]|\\.)*')"
    r"|(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<word>[A-Za-z_][A-Za-z_0-9]*))"
)

_KEYWORDS = {"and", "or", "not", "in", "matches", "true", "false"}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ValueError(f"bad token at: {src[pos:]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self, kind=None, value=None):
        k, v = self.peek()
        if kind is not None and k != kind:
            raise ValueError(f"expected {kind}, got {k}:{v!r}")
        if value is not None and v != value:
            raise ValueError(f"expected {value!r}, got {v!r}")
        self.i += 1
        return v

    def literal(self):
        k, v = self.peek()
        if k == "str":
            self.take()
            return re.sub(r"\\(.)", r"\1", v[1:-1])
        if k == "num":
            self.take()
            return float(v) if "." in v else int(v)
        if k == "word" and v in ("true", "false"):
            self.take()
            return v == "true"
        raise ValueError(f"expected literal, got {k}:{v!r}")

    def expr(self):
        node = self.and_e()
        while self.peek() == ("word", "or"):
            self.take()
            node = ("or", node, self.and_e())
        return node

    def and_e(self):
        node = self.not_e()
        while self.peek() == ("word", "and"):
            self.take()
            node = ("and", node, self.not_e())
        return node

    def not_e(self):
        k, v = self.peek()
        if (k, v) == ("word", "not"):
            self.take()
            return ("not", self.not_e())
        if k == "lparen":
            self.take()
            node = self.expr()
            self.take("rparen")
            return node
        return self.cmp()

    def cmp(self):
        col = self.take("word")
        if col in _KEYWORDS:
            raise ValueError(f"expected column name, got keyword {col!r}")
        # OTTL map subscript: attributes['key'] — the column ref becomes
        # a (map-column, key) pair resolved via maps.map_get per batch
        if self.peek()[0] == "lbracket":
            self.take()
            key = self.literal()
            if not isinstance(key, str):
                raise ValueError("map subscript needs a string key")
            self.take("rbracket")
            col = ("mapget", col, key)
        k, v = self.peek()
        if (k, v) == ("word", "in"):
            self.take()
            self.take("lparen")
            vals = [self.literal()]
            while self.peek()[0] == "comma":
                self.take()
                vals.append(self.literal())
            self.take("rparen")
            # loud at parse time: Arrow's value_set needs one type
            kinds = {type(x) for x in vals}
            if kinds - {int, float} and len(kinds) > 1:
                raise ValueError(f"'in' list mixes types: {vals!r}")
            return ("cmp", col, "in", vals)
        if (k, v) == ("word", "matches"):
            self.take()
            lit = self.literal()
            if not isinstance(lit, str):
                raise ValueError("'matches' needs a string pattern")
            return ("cmp", col, "matches", lit)
        op = self.take("op")
        return ("cmp", col, op, self.literal())


def parse_condition(src: str):
    """Parse an OTTL-style condition into an AST (validated once)."""
    p = _Parser(_tokenize(src))
    node = p.expr()
    if p.i != len(p.toks):
        raise ValueError(f"trailing tokens: {p.toks[p.i:]}")
    return node


def _eval(node, batch: pa.Table):
    kind = node[0]
    if kind == "cmp":
        ref = node[1]
        if isinstance(ref, tuple) and ref[0] == "mapget":
            col = map_get(batch[ref[1]], ref[2])
            return _mask(pa.table({"_v": col}), "_v", node[2], node[3])
        return _mask(batch, ref, node[2], node[3])
    if kind == "and":
        return pc.and_kleene(_eval(node[1], batch), _eval(node[2], batch))
    if kind == "or":
        return pc.or_kleene(_eval(node[1], batch), _eval(node[2], batch))
    if kind == "not":
        return pc.invert(_eval(node[1], batch))
    raise ValueError(f"bad node {node!r}")


def eval_condition(ast, batch: pa.Table):
    """Evaluate a parsed condition AST to a boolean mask (Kleene
    nulls preserved — callers decide the null policy)."""
    return _eval(ast, batch)


class ConditionFilter:
    """Actor-pool-friendly stage: condition parsed once (``__init__``),
    one vectorized mask per batch. Null comparisons are SQL-Kleene:
    a null predicate row is dropped (``filter`` keeps only true)."""

    def __init__(self, condition: str):
        self.ast = parse_condition(condition)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.filter(_eval(self.ast, batch))
