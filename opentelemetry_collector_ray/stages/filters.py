"""Filter stage — the filterprocessor / drop idiom.

Reference: predicate-based record removal (docs/processing.md:46,205-210
``drop() where attrs[...] == x``; primitive ``pcommon.Map.RemoveIf``,
pdata/pcommon/map.go:89-105). The collector also has the
``ErrSkipProcessingData`` sentinel that drops a whole batch
(processor/processorhelper/logs.go:62-66) — here a filter returning an
empty table is exactly that.

Predicates are simple (column, op, value) triples compiled once into
pyarrow.compute expressions — one vectorized kernel call per batch, and
the same triples can be pushed down to ``read_parquet(filter=...)``
when the filter is the first stage after the source.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
    "in": None,  # handled specially
    "not_in": None,
    "matches": None,  # regex
}


def _mask(batch: pa.Table, col: str, op: str, value) -> pa.ChunkedArray:
    c = batch[col]
    if op == "in":
        # pc.is_in yields FALSE for null inputs; SQL's IN yields NULL.
        # Propagate the null so `not in` stays Kleene-correct (a plain
        # invert would resurrect null rows SQL drops).
        m = pc.is_in(c, value_set=pa.array(value))
        return pc.if_else(pc.is_valid(c), m, pa.scalar(None, pa.bool_()))
    if op == "not_in":
        m = pc.is_in(c, value_set=pa.array(value))
        return pc.invert(
            pc.if_else(pc.is_valid(c), m, pa.scalar(None, pa.bool_()))
        )
    if op == "matches":
        cc = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        return pc.match_substring_regex(cc, value)
    fn = _OPS.get(op)
    if fn is None:
        raise ValueError(f"unknown filter op: {op!r}")
    return fn(c, value)


class FilterStage:
    """Keep rows matching ALL of ``include`` and NONE of ``exclude``.

    Mirrors the include/exclude match-properties shape of the collector
    filter processors. Null comparisons evaluate to null → treated as
    no-match (dropped by include, kept by exclude), same as SQL.
    """

    def __init__(self, include=None, exclude=None):
        self.include = [tuple(p) for p in (include or [])]
        self.exclude = [tuple(p) for p in (exclude or [])]
        for colname, op, _ in self.include + self.exclude:
            if op not in _OPS:
                raise ValueError(f"unknown filter op: {op!r}")
            if not isinstance(colname, str):
                raise ValueError("filter column must be a string")

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = None
        for colname, op, value in self.include:
            m = pc.fill_null(_mask(batch, colname, op, value), False)
            mask = m if mask is None else pc.and_(mask, m)
        for colname, op, value in self.exclude:
            m = pc.fill_null(_mask(batch, colname, op, value), False)
            m = pc.invert(m)
            mask = m if mask is None else pc.and_(mask, m)
        if mask is None:
            return batch
        return batch.filter(mask)

    @staticmethod
    def _pushdown_expr(colname: str, op: str, value):
        if op == "matches":
            return None
        f = pads.field(colname)
        return {
            "==": lambda: f == value,
            "!=": lambda: f != value,
            "<": lambda: f < value,
            "<=": lambda: f <= value,
            ">": lambda: f > value,
            ">=": lambda: f >= value,
            "in": lambda: f.isin(value),
            "not_in": lambda: ~f.isin(value),
        }[op]()

    def to_parquet_filter(self):
        """Pushdown form for ``read_parquet(filter=...)`` — only valid
        when every predicate is a simple comparison (no regex)."""
        expr = None
        for colname, op, value in self.include:
            e = self._pushdown_expr(colname, op, value)
            if e is None:
                return None
            expr = e if expr is None else expr & e
        for colname, op, value in self.exclude:
            e = self._pushdown_expr(colname, op, value)
            if e is None:
                return None
            # match __call__'s null semantics: a null comparison is
            # no-match → KEPT by exclude; bare ~e would evaluate null
            # and the scan would drop the row.
            ne = ~e | pads.field(colname).is_null()
            expr = ne if expr is None else expr & ne
        return expr
