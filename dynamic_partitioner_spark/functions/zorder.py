"""Z-order (Morton) interleaving for multi-column data clustering.

A single-column sorted export (``write_sorted``) gives perfect pruning
on ONE column and none on the others.  Interleaving the bits of several
quantized columns into one Morton value and range-partitioning on THAT
clusters the data so every file covers a small hyper-rectangle of the
combined key space — parquet min/max stats then prune scans filtered on
ANY of the participating columns (the idea behind Delta/Iceberg
``OPTIMIZE ZORDER BY``; public algorithm, implemented here as pure
Column arithmetic — shifts, masks, adds — inside whole-stage codegen).

Quantization is linear over a caller-declared ``[lo, hi)`` per column
(the sampling-free variant: bounds are usually known — ids, dates,
bounded measures).  Out-of-range values clamp to the edge buckets, so
the z-value is total and deterministic; the identical IEEE expression
is emitted for DuckDB by :func:`zorder_sql`, making exports
hash-checkable cross-engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (column, lo, hi) — quantization bounds, lo inclusive, hi exclusive.
ColSpec = tuple[str, float, float]


def _check_width(n_cols: int, bits: int) -> None:
    """Shared by all four entry points (r10 review: the masked-integer
    variants were smuggling dummy bounds through the combined check)."""
    if n_cols < 1:
        raise ValueError("need at least one column")
    if bits <= 0 or bits * n_cols > 63:
        raise ValueError("bits per column must be positive and the "
                         "interleaved width must fit a signed 64-bit int")


def _check(cols: list[ColSpec], bits: int) -> None:
    _check_width(len(cols), bits)
    for _, lo, hi in cols:
        # `not (hi > lo)`, NOT `hi <= lo`: a NaN bound passes every
        # comparison-based rejection (NaN <= x is false) and would
        # silently quantize EVERY row to one bucket — clustering and
        # pruning degrade to no-ops with no error (r15 review)
        if not (hi > lo):
            raise ValueError("each column needs hi > lo (and neither "
                             "bound may be NaN)")


def _quantize(col: str, lo: float, hi: float, n: int) -> Column:
    # same floor arithmetic as relational.histogram_fixed — identical
    # IEEE doubles in any engine, no width_bucket dependency.  Clamp in
    # the DOUBLE domain BEFORE the bigint cast: a far-out-of-range (or
    # NaN) value would otherwise overflow the cast — an ANSI/DuckDB
    # exception — instead of clamping to the edge bucket as documented
    # (DuckDB's least/greatest treat NaN as greatest; Spark's propagate
    # it into the cast — nanvl routes NaN to +inf so BOTH engines clamp
    # it to the top bucket).
    v = F.nanvl(F.col(col).cast("double"), F.lit(float("inf")))
    raw = F.floor((v - F.lit(float(lo))) * n
                  / F.lit(float(hi) - float(lo)))
    return (F.least(F.greatest(raw, F.lit(0.0)), F.lit(float(n - 1)))
            .cast("long"))


def _interleave(qs: list[Column], bits: int) -> Column:
    """THE Morton bit placement — column j's bit i lands at output
    position ``i·k + j`` (k = number of columns) — shared by the
    quantizing (:func:`zorder_value`) and masked-integer
    (:func:`zorder_key`) variants so there is exactly one
    implementation to fix (r10 review: two parallel interleaves had
    already diverged on the width cap).  Inputs must be non-negative
    BIGINTs below ``2^bits``."""
    k = len(qs)
    terms: list[Column] = []
    for j, q in enumerate(qs):
        for i in range(bits):
            terms.append(F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)), i * k + j))
    return reduce(lambda a, b: a + b, terms)


def _interleave_sql(qs: list[str], bits: int) -> str:
    """ANSI twin of :func:`_interleave`, term for term."""
    k = len(qs)
    terms = []
    for j, q in enumerate(qs):
        for i in range(bits):
            terms.append(f"((({q}) >> {i}) & 1) << {i * k + j}")
    return "(" + " + ".join(f"({t})" for t in terms) + ")"


def zorder_value(cols: list[ColSpec], bits: int = 8) -> Column:
    """Morton value interleaving ``bits`` bits of each quantized column
    (linear quantization over caller-declared [lo, hi) bounds).  Pure
    codegen: one floor per column, then shift/mask/add terms; no UDF,
    no shuffle."""
    _check(cols, bits)
    return _interleave([_quantize(c, lo, hi, 1 << bits)
                        for c, lo, hi in cols], bits)


def zorder_sql(cols: list[ColSpec], bits: int = 8) -> str:
    """DuckDB twin of :func:`zorder_value` — identical quantization and
    bit placement, so z-values hash-match bit-for-bit."""
    _check(cols, bits)
    n = 1 << bits
    qs = [(f"CAST(least(greatest(floor((CAST({c} AS DOUBLE) - {float(lo)})"
           f" * {n} / {float(hi) - float(lo)}), 0.0), {float(n - 1)})"
           f" AS BIGINT)")
          for c, lo, hi in cols]
    return _interleave_sql(qs, bits)


def zorder_key(cols: list[str], bits: int = 8) -> Column:
    """Masked-integer Morton variant: interleave the low ``bits`` bits
    of ALREADY-BUCKETED non-negative integer columns (no quantization
    — callers bucket real columns down to small ints; the mask makes
    stray high/negative bits total rather than undefined).  Same
    shared bit placement as :func:`zorder_value`; the layout-audit
    key ops_zorder_layout certifies it end to end."""
    _check_width(len(cols), bits)
    mask = (1 << bits) - 1
    return _interleave([F.col(c).cast("long").bitwiseAND(F.lit(mask))
                        for c in cols], bits)


def zorder_key_sql(cols: list[str], bits: int = 8) -> str:
    """ANSI twin of :func:`zorder_key` (same mask + shared bit
    placement) — build oracles from THIS so the engines cannot
    drift.  Each input is CAST to BIGINT exactly like the Spark
    side's ``.cast("long")``: without it, an INT32 column makes
    DuckDB shift and sum in 32-bit — ``1 << 31`` already overflows
    ("Out of Range"), so the default bits=8 with 4 columns errored
    on any INTEGER input while the Spark twin worked (r15 review)."""
    _check_width(len(cols), bits)
    mask = (1 << bits) - 1
    return _interleave_sql(
        [f"CAST({c} AS BIGINT) & {mask}" for c in cols], bits)
