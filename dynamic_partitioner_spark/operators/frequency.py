"""Frequent-item (heavy-hitter) mining at corpus scale (north-star
extension surface; the reference has no aggregation at all — SURVEY.md
§2.5).

The naive exact answer — ``groupBy(item).count()`` over every token —
shuffles the FULL item stream on the item key; at 100 TB that is the
largest shuffle a vocabulary-style job can produce.  The scalable
two-pass shape used here:

1. **Per-partition Misra-Gries summaries** (``mapInPandas``, bounded
   ``m = ceil(1/support)`` counters per partition, merged batch-wise
   with the standard mergeable-summaries rule): every item with global
   frequency ≥ ``support·N`` is GUARANTEED to survive in at least one
   partition's summary (if it were light in every partition it would be
   light globally), so the union of summaries is a complete candidate
   superset.  Output per partition: at most ``m`` candidate items —
   the shuffle carries candidates, never the token stream.
2. **Exact recount of candidates only**: broadcast the (tiny) distinct
   candidate set, semi-join the token stream map-side, hash-aggregate
   just the surviving tokens, filter ``count >= support·N``.

The final counts are EXACT and independent of partitioning (the sketch
only shapes the candidate superset), so the result is oracle-checkable
against a plain GROUP BY / HAVING — accuracy is not traded, only
shuffle volume.  Reference: Misra & Gries 1982; merge rule from
Agarwal et al., *Mergeable Summaries*, PODS 2012.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch: Counter, m: int) -> dict:
    """Merge a batch's exact counts into a Misra-Gries summary of at
    most ``m`` counters (combine, then subtract the (m+1)-th largest
    count from all and drop non-positive — the mergeable-summaries
    rule, which preserves the deficit bound count_est ≥ count_true −
    n/(m+1))."""
    for item, c in batch.items():
        counters[item] = counters.get(item, 0) + c
    if len(counters) > m:
        cut = sorted(counters.values(), reverse=True)[m]
        counters = {k: v - cut for k, v in counters.items() if v > cut}
    return counters


def heavy_hitters(items: DataFrame, item_col: str,
                  support: float) -> DataFrame:
    """Items with exact frequency ≥ ``support`` fraction of the total,
    with their EXACT counts: ``(item_col, n)``.

    ``items`` is the already-exploded item relation (one row per
    occurrence, e.g. tokens) of any hashable column type.  ``support``
    must be in (0, 1); the per-partition summary holds
    ``ceil(1/support)`` counters.

    Two passes over the item stream total: the summary pass also
    carries each partition's row count (one NULL-item marker row per
    partition), so N needs no separate counting job; the second pass
    is the candidate recount.
    """
    import math

    if not 0 < support < 1:
        raise ValueError("support must be in (0, 1)")
    m = math.ceil(1.0 / support)
    item_dt = items.schema[item_col].dataType.simpleString()
    # NULL items are ignored (NULL doubles as the per-partition count
    # marker in the summary relation)
    items = items.where(F.col(item_col).isNotNull())

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            counters = _mg_merge(counters, Counter(pdf[item_col]), m)
        yield pd.DataFrame({item_col: list(counters) + [None],
                            "_pn": [0] * len(counters) + [n_part]})

    summaries = items.select(item_col).mapInPandas(
        summarize, f"{item_col} {item_dt}, _pn long")
    # ONE bounded collect serves both statistics (<= m+1 rows per
    # partition summary — the same volume the broadcast would ship):
    # N from the NULL-item marker rows, candidates from the rest.
    # No persist, no second job, nothing left pinned for the returned
    # frame's lifetime (the r13 persist-retention class).
    srows = summaries.collect()
    total = sum(r["_pn"] for r in srows)
    cand_rows = sorted({r[0] for r in srows if r[0] is not None})
    cands = items.sparkSession.createDataFrame(
        [(v,) for v in cand_rows], f"{item_col} {item_dt}")
    return (items.join(F.broadcast(cands), item_col, "left_semi")
            .groupBy(item_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= F.lit(float(support)) * F.lit(int(total))))


def _cms_slot(term: str, row: int, width: int) -> int:
    """Deterministic md5-based CMS column for ``term`` in hash row
    ``row`` — portable across engines and runs (no PYTHONHASHSEED)."""
    import hashlib

    h = hashlib.md5(f"{row}:{term}".encode()).hexdigest()
    return int(h[:15], 16) % width


def cms_estimates(items: DataFrame, item_col: str, top: int = 20,
                  width: int = 1024, depth: int = 4) -> DataFrame:
    """Count-min sketch demo over an item stream: build per-partition
    ``depth × width`` sketches (``mapInPandas``), merge them with ONE
    cell-wise sum whose shuffle is ``depth·width`` rows per partition —
    independent of corpus size — then report the exact top-``top``
    items with both their true counts and their CMS point estimates
    ``(rank, item, n_true, n_est)``.

    The sketch is the mergeable, fixed-memory structure you keep when
    the distinct-item grid itself is too large to aggregate exactly
    (per-URL counters at 100 TB); the exact recount here exists to
    EXPOSE the estimation error, which pytest pins to the standard
    guarantee: ``n_true ≤ n_est ≤ n_true + e·N/width`` (Cormode &
    Muthukrishnan 2005) — overestimate-only, bounded by the stream
    mass.  md5 slot hashing keeps estimates deterministic.
    """
    import numpy as np

    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    items = items.where(F.col(item_col).isNotNull())

    def sketch(batches):
        tab = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            for term, c in Counter(pdf[item_col].astype(str)).items():
                for d in range(depth):
                    tab[d, _cms_slot(term, d, width)] += c
        d_idx, w_idx = np.nonzero(tab)
        yield pd.DataFrame({"d": d_idx.astype("int64"),
                            "w": w_idx.astype("int64"),
                            "c": tab[d_idx, w_idx]})

    cells = (items.select(F.col(item_col).cast("string").alias(item_col))
             .mapInPandas(sketch, "d long, w long, c long")
             .groupBy("d", "w").agg(F.sum("c").alias("c")))
    # merged sketch is bounded (depth·width cells) by construction —
    # the one deliberate driver-side collect
    table = {(r.d, r.w): r.c for r in cells.collect()}

    from pyspark.sql import Window
    exact = (items.groupBy(F.col(item_col).cast("string").alias(item_col))
             .agg(F.count(F.lit(1)).alias("n_true")))
    rnk = Window.orderBy(F.desc("n_true"), F.asc(item_col))
    topk = (exact.withColumn("rank", F.row_number().over(rnk))
            .where(F.col("rank") <= top))

    def estimate(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_est"] = [
                min(table.get((d, _cms_slot(t, d, width)), 0)
                    for d in range(depth))
                for t in pdf[item_col]]
            yield pdf

    return (topk.mapInPandas(
        estimate, f"{item_col} string, n_true long, rank long, n_est long")
        .select("rank", F.col(item_col).alias("item"), "n_true", "n_est"))
