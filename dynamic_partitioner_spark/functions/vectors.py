"""Vector math over ``array<float>`` embedding columns — JVM-side Column
expressions (``zip_with`` / ``aggregate``), computed in DOUBLE so results
are reproducible against the DuckDB oracle.  No UDFs: at 100 TB these
run inside whole-stage codegen with zero Python round-trips.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(c: Column) -> Column:
    """floor(x·1e4 + 0.5)/1e4 — NOT ``F.round``: Spark rounds HALF_UP
    (BigDecimal) while DuckDB rounds doubles half-away with float
    scaling, and ratios of small integers (jaccard = |∩|/|∪|) land on
    exact 5th-decimal midpoints often enough to cause data-dependent
    hash mismatches.  floor on identical IEEE doubles is bit-identical
    in both engines; pair with :data:`ROUND4_SQL`."""
    return F.floor(c * 10000 + F.lit(0.5)) / 10000


ROUND4_SQL = "floor(({x}) * 10000 + 0.5) / 10000"


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL (filtered by any
    # threshold predicate) instead of DIVIDE_BY_ZERO under ANSI mode.
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_batched(a: Column, b: Column) -> Column:
    """Arrow-batched cosine via numpy (einsum dot + vector norms).

    ~5× faster than the ``aggregate``/``zip_with`` Column form on pair-
    verify hot paths — Spark evaluates higher-order functions
    interpreted, outside codegen, while this runs BLAS over whole Arrow
    batches.  Summation order differs from the sequential Column form
    (pairwise/SIMD), so use it on rows-only paths and keep
    :func:`cosine` where a DuckDB oracle checks exact values.  Zero-norm
    rows come back NULL, not NaN — Spark orders NaN above every number,
    so a raw NaN would pass any ``>= threshold`` filter.  NULL and
    batch-ragged vectors also come back NULL, matching the Column
    form's null-propagation (r14 review: one dirty row previously
    raised numpy's inhomogeneous-shape error and killed the stage
    instead of NULLing like the form this replaces).
    """
    @F.pandas_udf("double")
    def _cos(x: pd.Series, y: pd.Series) -> pd.Series:
        xs, ys = x.tolist(), y.tolist()
        out = np.full(len(xs), np.nan)
        # group rows by their (equal-on-both-sides) dimension so each
        # group is a rectangular matmul — per-ROW semantics stay
        # batch-independent (a lone 32-dim pair computes the same
        # whether or not 64-dim pairs share its Arrow batch); rows
        # with a NULL side or mismatched lengths stay NaN -> NULL
        by_dim: dict[int, list[int]] = {}
        for i, (xv, yv) in enumerate(zip(xs, ys)):
            if xv is not None and yv is not None \
                    and len(xv) == len(yv) > 0:
                by_dim.setdefault(len(xv), []).append(i)
        for dim, idx in by_dim.items():
            mx = np.asarray([xs[i] for i in idx], dtype=np.float64)
            my = np.asarray([ys[i] for i in idx], dtype=np.float64)
            num = np.einsum("ij,ij->i", mx, my)
            den = (np.linalg.norm(mx, axis=1)
                   * np.linalg.norm(my, axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                out[idx] = np.where(den > 0, num / den, np.nan)
        return pd.Series(out)

    raw = _cos(a, b)
    return F.when(F.isnan(raw), F.lit(None)).otherwise(raw)


#: DuckDB twin; coalesce matters — list_sum([]) is NULL in DuckDB while
#: Spark's aggregate over an empty array returns the 0.0 seed.
L2_NORM_SQL = ("sqrt(coalesce(list_sum(list_transform({a}::DOUBLE[], "
               "x -> x * x)), 0.0))")

