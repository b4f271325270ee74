"""Relational operators Spark lacks as built-ins, re-expressed as
compositions of shuffle-friendly primitives (north-star extension
surface — the reference has no query layer at all, SURVEY.md §2.4-2.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join_binned(left: DataFrame, right: DataFrame, left_point: str,
                      start_col: str, end_col: str,
                      bin_width: int,
                      max_bins_per_interval: int = 1_000_000) -> DataFrame:
    """Interval join ``left.point ∈ [right.start, right.end)`` without a
    nested-loop plan.

    Spark plans a raw non-equi join as BroadcastNestedLoopJoin — O(n·m)
    and driver-bound when the interval side outgrows the broadcast
    threshold.  The standard scalable re-expression: quantize time into
    fixed-width bins, explode each interval into the bins it overlaps,
    equi-join on the bin, then apply the exact range predicate.

    * each left row lands in exactly ONE bin → no duplicate matches, no
      post-join dedup;
    * an interval of length L explodes into ⌈L/bin_width⌉+1 bins — pick
      ``bin_width`` ≈ the typical interval length so the explode factor
      is ~2;
    * the join is a plain equi-join on ``_bin``: Catalyst broadcasts a
      small interval side or sort-merge-joins two big sides — both
      shapes scale, neither is BNL.

    ``left_point``, ``start_col``, ``end_col`` must be integral (e.g.
    epoch micros).  Columns from both sides survive.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    lbin = F.expr(f"`{left_point}` div {bin_width}").alias("_bin")
    l = left.select("*", lbin)
    sbin = F.expr(f"`{start_col}` div {bin_width}")
    ebin = F.expr(f"`{end_col}` div {bin_width}")
    # loud guard (same coalesce-over-assert_true trick as
    # densify_time_buckets): one corrupt open-ended interval would
    # otherwise explode into millions of bin rows
    # both bounds: an INVERTED interval (end < start) would otherwise
    # slip past the width check and F.sequence would generate a huge
    # DESCENDING bin list (Spark defaults to step -1 when start > stop)
    span_ok = F.assert_true(
        (ebin >= sbin)
        & (ebin - sbin < F.lit(int(max_bins_per_interval))),
        F.lit(f"interval inverted or wider than max_bins_per_interval"
              f"={max_bins_per_interval} bins"))
    bins = F.sequence(F.coalesce(span_ok.cast("long"), sbin), ebin)
    # a NULL bound made assert_true(NULL) abort the whole job with the
    # MISLEADING width-violation message (r13 review, verified) —
    # an open/unclosed interval simply matches nothing, like the
    # point predicates below would decide anyway
    r = (right.where(F.col(start_col).isNotNull()
                     & F.col(end_col).isNotNull())
         .select("*", F.explode(bins).alias("_bin")))
    return (l.join(r, "_bin")
            .where((F.col(left_point) >= F.col(start_col))
                   & (F.col(left_point) < F.col(end_col)))
            .drop("_bin"))


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column profile: rows, nulls, exact distincts,
    min/max (stringified for a uniform schema) per column — one pass
    over the data (a single aggregate computes every column's stats;
    the distincts expand internally but still one scan)."""
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    parts = []
    for c in cols:
        parts.append(wide.select(
            F.lit(c).alias("column"), "n_rows",
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def funnel(df: DataFrame, user_col: str, ts_col: str, type_col: str,
           steps: list[str], max_gap: int | None = None) -> DataFrame:
    """Ordered-funnel analysis: per step, how many users reached it IN
    ORDER (each step strictly after the previous one's first
    completion).  The classic product-analytics query.  With
    ``max_gap`` set, each step additionally must first complete
    within that many time units of the previous step (the
    conversion-window variant — see :func:`funnel_windowed`).

    Shape: one aggregate per step over the (already keyed) per-user
    relation — step k joins the per-user first-completion time of step
    k-1 and takes ``min(ts) where ts > prev`` — k small (funnels are
    3-5 steps), each pass a hash-agg on user_id, re-using the same
    partitioning.  Deterministic, SQL-expressible (oracle twin).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if max_gap is not None and max_gap <= 0:
        raise ValueError("max_gap must be positive")
    ev = df.select(F.col(user_col).alias("u"), F.col(ts_col).alias("t"),
                   F.col(type_col).alias("k"))
    reached = None  # per-user first time the previous step completed
    counts = []
    for i, step in enumerate(steps):
        cur = ev.where(F.col("k") == step)
        if reached is None:
            firsts = cur.groupBy("u").agg(F.min("t").alias("ft"))
        else:
            in_order = F.col("t") > F.col("ft")
            if max_gap is not None:
                in_order = in_order & (
                    F.col("t") <= F.col("ft") + F.lit(int(max_gap)))
            firsts = (cur.join(reached, "u")
                      .where(in_order)
                      .groupBy("u").agg(F.min("t").alias("ft")))
        reached = firsts
        counts.append(
            firsts.agg(F.count(F.lit(1)).alias("n_users"))
            .select(F.lit(i + 1).alias("step_idx"),
                    F.lit(step).alias("step"), "n_users"))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt_src: str, n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Skew-mitigating equi-join: a hot key's left rows are spread over
    ``n_salts`` shuffle partitions instead of one.

    Left rows get a deterministic salt (``xxhash64(salt_src) mod n``,
    ``salt_src`` any left column — an id gives uniform spread); the
    right side is replicated once per salt via a ``sequence`` explode.
    The join key becomes (key, salt), so a key whose left side is 10⁸
    rows becomes ``n_salts`` balanced tasks rather than one straggler.
    Each left row matches exactly the right replica carrying its own
    salt → result multiplicity is identical to the plain join (pinned
    in tests), with no dedup pass.

    Cost model: right shuffle volume × n_salts — use for big-left ×
    modest-right skew; AQE's skew-join split covers sort-merge cases,
    but salting also works for aggregate-after-join pipelines and when
    the skew is known up front.  Deterministic: no ``rand()``.

    Only left-preserving join types are accepted: with ``right``/
    ``full``, an unmatched right row exists once per salt replica and
    would surface ``n_salts`` times (ADVICE r2).
    """
    if n_salts <= 0:
        raise ValueError("n_salts must be positive")
    if how.lower().replace("_", "") not in (
            "inner", "left", "leftouter", "leftsemi", "leftanti",
            "semi", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "right side would emit unmatched right rows once per salt "
            "(use a plain join or AQE skew handling for right/full)")
    l = left.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)),
                                        F.lit(n_salts)))
    r = right.withColumn("_salt", F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")))
    return l.join(r, [key, "_salt"], how).drop("_salt")


def salted_join_auto(left: DataFrame, right: DataFrame, key: str,
                     salt_src: str, n_salts: int = 16,
                     how: str = "inner",
                     hot_factor: float = 5.0) -> DataFrame:
    """:func:`salted_join` with DETECTED hot keys: only keys whose left
    count exceeds ``hot_factor ×`` the mean per-key count are salted;
    everything else takes the plain join path.

    Blanket salting replicates the whole right side ``n_salts``×; in
    real corpora skew is a handful of keys (the null-ish id, the
    crawler default, the test account), so the production shape is:
    one counting pass over the left key column (cheap — map-side
    partial agg of one column), broadcast the tiny hot-key list, split
    both sides with semi/anti joins, salt ONLY the hot slice, union.
    Right replication then costs |right∩hot| × n_salts rows instead of
    |right| × n_salts.  Result is identical to the plain join (union
    of disjoint key slices; pinned by the oracle).  Same
    left-preserving ``how`` restriction as :func:`salted_join`.

    At 100 TB: if the skew is known ahead (it usually is), persist the
    hot-key list and skip the counting pass.
    """
    stats = left.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    mean = stats.agg(F.avg("_n").alias("_avg"))
    hot = (stats.crossJoin(F.broadcast(mean))
           .where(F.col("_n") > F.lit(float(hot_factor)) * F.col("_avg"))
           .select(key))
    # null-SAFE routing: the skew profile's classic case is a hot
    # NULL join key, but a null-unsafe semi-join can never match it —
    # every NULL row fell to the cold path and shuffled into one
    # straggler partition, the exact problem this operator exists to
    # remove (r13 review).  The salted slice handles NULLs fine: they
    # match nothing (equi-join semantics preserved) while the salt
    # spreads them across partitions.
    hk = F.broadcast(hot.select(F.col(key).alias("_hk")))
    is_hot = F.col(key).eqNullSafe(F.col("_hk"))
    l_hot = left.join(hk, is_hot, "left_semi")
    l_cold = left.join(hk, is_hot, "left_anti")
    r_hot = right.join(hk, is_hot, "left_semi")
    cold = l_cold.join(right, key, how)
    salted = salted_join(l_hot, r_hot, key, salt_src, n_salts, how)
    return cold.unionByName(salted)


def cdc_latest(changes: DataFrame, key_cols: list[str], seq_col: str,
               op_col: str = "op", delete_op: str = "D",
               keep_deletes: bool = False) -> DataFrame:
    """Materialize a CDC change stream into its final table state:
    latest-wins per key by monotone sequence; a delete as the latest
    change drops the key entirely.

    The classic "apply changes" operator (Debezium/Delta `APPLY CHANGES
    INTO` semantics, upsert + delete): rank each key's changes by
    ``seq_col`` descending, keep rank 1, then filter out keys whose
    winning change is a delete.  One shuffle on the key (window
    partitioning); no join, no driver state.  At 100 TB of change log
    this is the shape you want — the window's sort is per-key and the
    rank-1 filter is pushed into the shuffle as a `WindowGroupLimit`
    (top-1 per key), so executors never materialize full per-key
    change history.

    ``seq_col`` must be unique within a key (a log offset / LSN);
    ties would make the winner nondeterministic, so callers with
    coarse sequence numbers should compose a (seq, tiebreak) struct
    column first.  ``op_col`` is dropped from the output; every other
    column of the winning change row survives.

    ``keep_deletes=True`` returns every key's winning change WITH the
    op column retained (delete winners included) — the shape a merge
    writer needs to split upserts from delete keys (see
    ``streaming.write.run_streaming_upsert``).
    """
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(seq_col).desc()))
    winners = (changes
               .withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") == 1)
               .drop("_rn"))
    if keep_deletes:
        return winners
    # null-safe: a winning change with NULL op is an upsert, not a
    # silent delete (three-valued != would drop the key entirely)
    return (winners.where(~F.col(op_col).eqNullSafe(delete_op))
            .drop(op_col))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Diff two snapshots of the same keyed table: one row per key that
    was ``added``, ``removed``, or ``changed`` (any ``compare_cols``
    value differs) — the audit/reconciliation primitive behind "what
    did this pipeline run change?".

    One full-outer hash join on the key; the change classification is a
    null-pattern CASE over the joined row, and unchanged keys are
    filtered before anything else happens downstream — so the output
    is change-sized, not table-sized.  NULL-safe comparison (``<=>``)
    keeps a NULL→value transition classified as a change rather than
    silently equal.

    Returns ``key_cols + [change]`` with per-column old/new pairs for
    the compared columns (``<col>_old`` / ``<col>_new``).
    """
    # explicit presence markers: a compare column may be legitimately
    # NULL in a present row, so data columns can't signal side-presence
    # eqNullSafe keys: the USING-style full outer matched NULL keys
    # null-unsafely, so an identical unchanged row with a NULL key
    # component was double-reported as removed AND added on every
    # reconciliation run (r13 review, verified)
    from functools import reduce as _reduce
    o = old.select(*[F.col(k).alias(f"_ok_{k}") for k in key_cols],
                   F.lit(1).alias("_o_present"),
                   *[F.col(c).alias(f"_o_{c}") for c in compare_cols])
    n = new.select(*[F.col(k).alias(f"_nk_{k}") for k in key_cols],
                   F.lit(1).alias("_n_present"),
                   *[F.col(c).alias(f"_n_{c}") for c in compare_cols])
    j = o.join(n, _reduce(lambda a, b: a & b,
                          [F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
                           for k in key_cols]), "full_outer")
    in_old = F.col("_o_present").isNotNull()
    in_new = F.col("_n_present").isNotNull()
    # empty compare_cols is a legitimate key-presence-only diff
    # (added/removed, never changed) — not a crash
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (F.when(~in_old, F.lit("added"))
              .when(~in_new, F.lit("removed"))
              .when(~same, F.lit("changed")))
    out_cols = [*[F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}"))
                  .alias(k) for k in key_cols],
                change.alias("change")]
    for c in compare_cols:
        out_cols += [F.col(f"_o_{c}").alias(f"{c}_old"),
                     F.col(f"_n_{c}").alias(f"{c}_new")]
    return j.select(*out_cols).where(F.col("change").isNotNull())


def state_transitions(df: DataFrame, key_col: str,
                      order_cols: list[str], state_col: str) -> DataFrame:
    """The ONE per-key ordered transition-stream construction
    ``(key, from_state, to_state)`` shared by
    :func:`transition_matrix`, :func:`sequence_conformance` and
    ``lm.sequence_lm_score`` — a single definition so transition
    semantics (ordering totality, NULL filtering) cannot silently
    diverge between consumers.  ``order_cols`` must be a total order
    (ts + id), otherwise ``lead`` is nondeterministic.

    BOTH endpoints must be non-NULL: a NULL mid-sequence state yields
    no transition (its incoming and outgoing steps are both dropped).
    Without the ``from_state`` filter, Spark's ``left_anti`` in
    :func:`sequence_conformance` KEEPS NULL-from rows (NULL keys never
    match) while a SQL ``NOT IN`` oracle evaluates NULL and DROPS them
    — a latent cross-engine divergence (ADVICE r5)."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return (df.select(F.col(key_col).alias("_k"),
                      F.col(state_col).alias("from_state"),
                      F.lead(state_col).over(w).alias("to_state"))
            .where(F.col("to_state").isNotNull()
                   & F.col("from_state").isNotNull()))


def transition_matrix(df: DataFrame, key_col: str, order_cols: list[str],
                      state_col: str) -> DataFrame:
    """Markov transition counts over per-key ordered event sequences:
    for each observed ``(from_state, to_state)`` step, the count and
    the row-normalized transition probability — the sequence-mining
    primitive behind next-event prediction and session-flow analysis.

    One shuffle on ``key_col`` (window ``lead``), then a hash aggregate
    on the tiny (from, to) state grid; the probability denominator is a
    window over that grid, which is states² rows — negligible at any
    scale.  ``order_cols`` must make the per-key ordering total (pass a
    tiebreaker like the event id alongside the timestamp), otherwise
    ``lead`` is nondeterministic.

    Probability uses floor-rounding (``vectors.round4``) so the ratio
    of small integers hashes identically in the DuckDB oracle.
    """
    from ..functions.vectors import round4
    steps = state_transitions(df, key_col, order_cols, state_col)
    counts = (steps.groupBy("from_state", "to_state")
              .agg(F.count(F.lit(1)).alias("n_transitions")))
    total = Window.partitionBy("from_state")
    return counts.select(
        "from_state", "to_state", "n_transitions",
        round4(F.col("n_transitions")
               / F.sum("n_transitions").over(total)).alias("p"))


def histogram_fixed(df: DataFrame, value_col: str, lo: float, hi: float,
                    n_bins: int, agg_col: str | None = None) -> DataFrame:
    """Fixed-width histogram as a single hash aggregate: bucket 1..n
    for in-range values, 0 for underflow, n+1 for overflow
    (``width_bucket`` semantics, spelled as explicit floor arithmetic
    so the same IEEE expression runs in any engine — DuckDB has no
    ``width_bucket``).

    Emits per-bucket ``(bucket, bucket_lo, n_rows[, sum_<agg_col>])``.
    Empty buckets are absent (the aggregate never sees them); callers
    needing dense output can right-join a ``sequence`` spine.  One
    scan, map-side partial aggregation, shuffle cardinality = n_bins —
    the canonical distributive aggregate.
    """
    if n_bins <= 0 or hi <= lo:
        raise ValueError("need n_bins > 0 and hi > lo")
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) * n_bins
                  / F.lit(float(hi) - float(lo))) + 1
    # least(): float rounding can push (v-lo)*n/(hi-lo) for v just
    # below hi up to exactly n_bins — clamp so an in-range value never
    # lands in the overflow bucket
    # NULL values are not observations: without the isNotNull branch
    # they fell through every when() to the otherwise(), where
    # least(NULL-raw, n_bins) returned n_bins — silently inflating the
    # TOP in-range bucket (r13 review, verified)
    bucket = (F.when(v.isNull(), F.lit(None))
              .when(v < lo, F.lit(0))
              .when(v >= hi, F.lit(n_bins + 1))
              .otherwise(F.least(raw, F.lit(n_bins)))).alias("bucket")
    width = (float(hi) - float(lo)) / n_bins
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if agg_col is not None:
        # floor trick, not F.round: Spark rounds via BigDecimal
        # HALF_UP on the exact double while DuckDB scales the float —
        # a 3rd-decimal midpoint sum diverges by 0.01 cross-engine
        # (the vectors.round4 rationale at 2 decimals, r15 review)
        aggs.append(
            (F.floor(F.sum(agg_col) * 100 + F.lit(0.5)) / 100)
            .alias(f"sum_{agg_col}"))
    out_cols = ["bucket",
                (F.lit(float(lo)) + (F.col("bucket") - 1) * width)
                .alias("bucket_lo"),
                "n_rows"]
    if agg_col is not None:
        out_cols.append(f"sum_{agg_col}")
    return (df.groupBy(bucket).agg(*aggs)
            .where(F.col("bucket").isNotNull())
            .select(*out_cols))


def cohort_retention(df: DataFrame, user_col: str, day: Column) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day, then
    for each (cohort_day, day_offset) the count of cohort members still
    active — the standard product-retention triangle.

    Shape: distinct (user, day) first (collapses event volume to
    activity days), per-user min-day hash agg, one equi-join back on
    user (both sides already partitioned by user from their aggs), then
    a small hash agg on the (cohort, offset) grid.  No window over raw
    events, no driver state; the only relation that isn't user- or
    grid-sized is the initial distinct, which is the unavoidable scan.

    ``day`` is an integral Column (e.g. epoch days derived from the
    event timestamp).

    NULL users are EXCLUDED explicitly (r15 review): an unidentified
    user is not a cohort member — before the filter, every anonymous
    event silently vanished in the null-unsafe join anyway (the worst
    of both: lost AND undocumented), while a null-safe join would
    have fused all anonymous traffic into one fake "user" inflating
    its cohort by exactly 1.  Pre-filter identified traffic is the
    honest contract; the SQL twin filters identically.
    """
    activity = (df.where(F.col(user_col).isNotNull())
                .select(F.col(user_col).alias("_u"), day.alias("_d"))
                .distinct())
    cohorts = activity.groupBy("_u").agg(F.min("_d").alias("_cohort"))
    return (activity.join(cohorts, "_u")
            .groupBy(F.col("_cohort").alias("cohort_day"),
                     (F.col("_d") - F.col("_cohort")).alias("day_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


def forward_fill(df: DataFrame, key_col: str, order_cols: list[str],
                 cols: list[str]) -> DataFrame:
    """Per-key forward fill: each NULL in ``cols`` takes the most recent
    non-NULL value in the ``order_cols`` ordering — the gap-repair
    primitive for sensor feeds and slowly-changing attributes.

    One shuffle on ``key_col`` shared by every filled column (a single
    window frame, ``last ... ignorenulls`` over unbounded-preceding).
    ``order_cols`` must be a total order within a key or the fill is
    nondeterministic.
    """
    w = (Window.partitionBy(key_col).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def rollup_time_grains(df: DataFrame, ts_us: Column, value_col: str,
                       grains: dict[str, int] | None = None) -> DataFrame:
    """Hypertable-style continuous aggregate: the same measure rolled up
    at several time grains in ONE scan (union of per-grain hash aggs —
    each partially aggregates map-side, so the scan cost is paid once
    and each grain shuffles only its own group cardinality).

    Returns (grain, bucket_start_us, n_events, total_value).  Write the
    result partitioned by ``grain`` with this engine's own sink and a
    dashboard's day query becomes a partition-pruned scan of the day
    grain only.

    ``grains`` maps name → width in microseconds (default minute/hour/
    day).  Deterministic: buckets are integer division of epoch micros.
    """
    grains = grains or {"minute": 60_000_000, "hour": 3_600_000_000,
                        "day": 86_400_000_000}
    base = df.select(ts_us.alias("_us"), F.col(value_col).alias("_v"))
    parts = []
    for name, width in grains.items():
        parts.append(
            base.groupBy((F.expr(f"_us div {width}") * width)
                         .alias("bucket_start_us"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("_v"), 2).alias("total_value"))
            .select(F.lit(name).alias("grain"), "bucket_start_us",
                    "n_events", "total_value"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scd2_build(changes: DataFrame, key_cols: list[str], seq_col: str,
               attr_cols: list[str]) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a versioned change feed
    into validity intervals — each change row becomes a dimension
    version valid from its own sequence until the key's next change
    (``valid_to`` NULL + ``is_current`` on the latest).

    The standard warehouse dimension-history build.  One ``lead``
    window per key (the single shuffle any per-key op needs); interval
    columns are pure codegen.  The sequence must be unique per key —
    same contract as ``cdc_latest``.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col))
    nxt = F.lead(seq_col).over(w)
    return changes.select(
        *key_cols,
        F.col(seq_col).alias("valid_from"),
        nxt.alias("valid_to"),
        (nxt.isNull()).alias("is_current"),
        *attr_cols)


def densify_time_buckets(df: DataFrame, key_col: str, us: Column,
                         bucket_us: int = 3_600_000_000,
                         max_buckets: int = 1_000_000) -> DataFrame:
    """Calendar densification (gap fill): one row per ``bucket_us``-wide
    time bucket between each key's first and last event, with the
    actual event count — ZERO-filled buckets included, so downstream
    window math (moving averages, gap detection, charting) sees a
    complete grid instead of silently skipping empty periods.

    Shape: per-key aggregate → ``sequence`` explode of the bucket range
    (bounded by each key's own span) → broadcast-friendly left join of
    the actual per-bucket counts.  Integer bucket arithmetic (``div``)
    so both engines compute identical buckets.  Returns
    ``(key, bucket_idx, n_events)``.

    ``max_buckets`` fails the job LOUDLY (``assert_true``, evaluated
    executor-side with no extra action) if any single key's span would
    densify to more than that many buckets — one key with a corrupt
    epoch-0 timestamp would otherwise try to materialize a
    half-century of hourly rows.
    """
    base = df.select(F.col(key_col).alias("_k"), us.alias("_us"))
    bk = base.select("_k", F.expr(f"_us div {bucket_us}").alias("_b"))
    counts = bk.groupBy("_k", "_b").agg(F.count(F.lit(1)).alias("_n"))
    spans = counts.groupBy("_k").agg(F.min("_b").alias("_lo"),
                                     F.max("_b").alias("_hi"))
    span_ok = F.assert_true(
        F.col("_hi") - F.col("_lo") < F.lit(int(max_buckets)),
        F.concat(F.lit("densify span over max_buckets for key "),
                 F.col("_k").cast("string")))
    # assert_true returns NULL on success; coalescing _lo over it keeps
    # the check in the plan — a dropped side column would be pruned,
    # and an equal-branch CASE would be simplified away
    lo_checked = F.coalesce(span_ok.cast("long"), F.col("_lo"))
    grid = spans.select(
        "_k",
        F.explode(F.sequence(lo_checked, F.col("_hi"))).alias("_b"))
    # eqNullSafe on the KEY: a USING left join is null-unsafe, so a
    # NULL key's real count rows never matched their own grid rows and
    # every bucket reported a FABRICATED 0 while the data was silently
    # discarded (r15 review — worse than dropping the key; the SQL
    # twin joins IS NOT DISTINCT FROM for the same reason).  Buckets
    # (_b) come from sequence() and are never NULL, so plain equality
    # is right there.
    g, c = grid.alias("g"), counts.alias("c")
    return (g.join(c, F.col("g._k").eqNullSafe(F.col("c._k"))
                   & (F.col("g._b") == F.col("c._b")), "left")
            .select(F.col("g._k").alias(key_col),
                    F.col("g._b").alias("bucket_idx"),
                    F.coalesce(F.col("c._n"), F.lit(0)).alias("n_events")))


def seq_ngrams(df: DataFrame, key_col: str, order_cols: list[str],
               state_col: str, n: int = 3, top: int = 25) -> DataFrame:
    """Sequential-pattern mining over per-key ordered event streams:
    the global top-``top`` length-``n`` state n-grams (consecutive
    event-type runs), the step past :func:`transition_matrix`'s bigram
    Markov view — the primitive behind funnel discovery and
    next-sequence features.

    One shuffle on ``key_col`` (a single window sort serves all the
    ``lead`` offsets), then a hash aggregate on the tiny observed
    n-gram grid; the top-``top`` cut is a ``row_number`` over that
    already-aggregated grid (rows = distinct n-grams, not events), so
    the second shuffle moves almost nothing.  ``order_cols`` must make
    the per-key ordering total (ts + event id), otherwise ``lead`` is
    nondeterministic.  Ties in the ranking break on the gram string so
    both engines cut identically.

    Gram encoding is collision-proof (ADVICE r5): state values are
    escaped (``\\`` → ``\\\\``, ``>`` → ``\\>``) before the ``>`` join,
    so distinct sequences never collide even when a state contains the
    delimiter; and a window containing ANY NULL state yields no gram
    (previously only the last step was checked, so a NULL mid-step
    silently counted an (n-1)-gram as an n-gram).
    """
    if n < 2:
        raise ValueError("n must be >= 2")

    def _esc(c):
        return F.replace(F.replace(c, F.lit("\\"), F.lit("\\\\")),
                         F.lit(">"), F.lit("\\>"))

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    steps = [F.col(state_col)] + [F.lead(state_col, i).over(w)
                                  for i in range(1, n)]
    all_set = steps[0].isNotNull()
    for s in steps[1:]:
        all_set = all_set & s.isNotNull()
    grams = (df
             .withColumn("_gram", F.concat_ws(">", *[_esc(s) for s in steps]))
             .withColumn("_ok", all_set)
             .where(F.col("_ok")))
    counts = grams.groupBy(F.col("_gram").alias("gram")).agg(
        F.count(F.lit(1)).alias("n_seq"))
    # unpartitioned window over the OBSERVED-GRAM counts only (one row
    # per distinct n-gram, bounded by the gram vocabulary, not the
    # event volume) — the single-partition WindowExec warning is
    # accepted by design
    rnk = Window.orderBy(F.desc("n_seq"), F.asc("gram"))
    return (counts
            .withColumn("rnk", F.row_number().over(rnk))
            .where(F.col("rnk") <= top))


def ohlc_bars(df: DataFrame, key_col: str, bucket: Column,
              value_col: str, order_cols: list[str]) -> DataFrame:
    """Time-series downsampling to OHLC bars: per ``(key, bucket)``,
    the open (first value in bar order), high, low, close (last) and
    event count — the resample primitive behind dashboarding and
    feature extraction over metric streams.

    Single shuffle on ``(key, bucket)``: both window passes (ascending
    and descending ``row_number``) share the partitioning, so Catalyst
    plans one exchange with two sorts, then the final hash aggregate
    is partial-aggregated map-side over already-colocated rows.
    ``order_cols`` must be a total order within the bar (ts + event
    id) so open/close are deterministic in both engines.
    """
    base = df.select(F.col(key_col).alias("_k"), bucket.alias("_b"),
                     F.col(value_col).alias("_v"), *order_cols)
    wa = Window.partitionBy("_k", "_b").orderBy(*[F.asc(c) for c in order_cols])
    wd = Window.partitionBy("_k", "_b").orderBy(*[F.desc(c) for c in order_cols])
    marked = base.select(
        "_k", "_b", "_v",
        F.row_number().over(wa).alias("_ra"),
        F.row_number().over(wd).alias("_rd"))
    return (marked.groupBy("_k", "_b")
            .agg(F.max(F.when(F.col("_ra") == 1, F.col("_v"))).alias("open"),
                 F.max("_v").alias("high"),
                 F.min("_v").alias("low"),
                 F.max(F.when(F.col("_rd") == 1, F.col("_v"))).alias("close"),
                 F.count(F.lit(1)).alias("n_events"))
            .select(F.col("_k").alias(key_col), F.col("_b").alias("bucket"),
                    "open", "high", "low", "close", "n_events"))


def key_skew_profile(df: DataFrame, key_col: str, top: int = 20) -> DataFrame:
    """Join-key skew diagnostics: the top-``top`` heaviest keys with
    their row counts, parts-per-million share, and skew ratio
    (key count ÷ mean per-key count) — the measurement step that
    decides whether a join needs salting (`salted_join`), AQE skew
    handling, or nothing.

    Two aggregates: per-key counts (one shuffle on the key — the same
    shuffle the join under diagnosis would do), then a broadcast of
    the 2-row global stats (total rows / distinct keys) back across
    the top keys.  The ranked cut happens BEFORE the broadcast join so
    only ``top`` rows ever leave the aggregate.  Integer ppm and
    floor-rounded ratio keep cross-engine hashes exact.
    """
    from ..functions.vectors import round4
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_nkeys"))
    # NULL keys stay IN the profile (a hot NULL join key is a classic
    # skew source) but the tie-break must pin their position: Spark
    # defaults ASC to NULLS FIRST while DuckDB defaults NULLS LAST, so
    # an unpinned tie at the cut boundary would diverge cross-engine.
    # NOT a single-partition sort of the full key set: Spark's limit
    # pushdown plans TakeOrderedAndProject(limit=top) UNDER this
    # window for the rnk <= top filter, so only `top` rows ever reach
    # the window (verified in the executed plan; pinned in
    # tests/test_relational.py — the r14/r15 reviews both
    # re-flagged this shape)
    rnk = Window.orderBy(F.desc("n_rows"), F.asc_nulls_last("key"))
    topk = (counts.withColumn("rnk", F.row_number().over(rnk))
            .where(F.col("rnk") <= top))
    return (topk.crossJoin(F.broadcast(totals))
            .select("key", "n_rows", "rnk",
                    # floor (not cast) — DuckDB's double→BIGINT cast
                    # rounds-to-nearest where Spark's truncates
                    F.floor(F.col("n_rows") * F.lit(1_000_000)
                            / F.col("_total")).alias("share_ppm"),
                    round4(F.col("n_rows") * F.col("_nkeys")
                           / F.col("_total")).alias("skew_ratio")))


def lag_features(df: DataFrame, key_col: str, order_cols: list[str],
                 value_col: str, n_lags: int = 2,
                 roll: int = 3) -> DataFrame:
    """Per-key lag/rolling feature extraction — the standard ML
    feature-engineering pass over an ordered metric stream: previous
    values (``lag_1..lag_n``), the step delta, and a trailing
    ``roll``-row mean, all per key in event order.

    ONE shuffle serves everything: every window shares the same
    partitioning and ordering, so Catalyst plans a single exchange +
    sort and evaluates all the frames in one Window node.
    ``order_cols`` must be a total order (ts + id).  The rolling mean
    floor-rounds (``round4``) so ratios of doubles hash identically in
    the oracle.
    """
    if n_lags < 1 or roll < 1:
        # bad arguments otherwise fail deep inside Spark (invalid
        # window frame / UNRESOLVED_COLUMN lag_1) — name the mistake
        # at entry like the sibling operators do (r13 review)
        raise ValueError(
            f"need n_lags >= 1 and roll >= 1, got n_lags={n_lags}, "
            f"roll={roll}")
    from ..functions.vectors import round4
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    wr = w.rowsBetween(-(roll - 1), 0)
    out = df
    for i in range(1, n_lags + 1):
        out = out.withColumn(f"lag_{i}", F.lag(value_col, i).over(w))
    return (out
            .withColumn("delta", F.col(value_col) - F.col("lag_1"))
            .withColumn("roll_mean", round4(F.avg(value_col).over(wr))))


def attribution(df: DataFrame, user_col: str, ts_us_col: str,
                id_col: str, type_col: str, touch_types: list[str],
                conversion_type: str,
                lookback_us: int = 86_400_000_000) -> DataFrame:
    """Marketing-style conversion attribution: for every conversion
    event, the FIRST-touch and LAST-touch channel among the user's
    touch events inside the lookback window, aggregated to
    ``(model, channel, n_conversions)`` — channel ``none`` when no
    touch preceded the conversion in time.

    Single shuffle on the user key: touches and conversions ride ONE
    per-user stream ordered by event time, and a RANGE frame
    (``lookback_us`` preceding → current) computes both models at once
    via conditional min/max over a ``(ts, id, type)`` struct —
    lexicographic struct ordering makes first=min and last=max with
    the id as a total tie-break, so no self-join, no range join, no
    per-conversion scan.  The final aggregate runs on the tiny
    (model × channel) grid.
    """
    ev = (df.where(F.col(type_col).isin(list(touch_types)
                                        + [conversion_type]))
          .select(F.col(user_col).alias("_u"),
                  F.col(ts_us_col).alias("_ts"),
                  F.col(id_col).alias("_id"),
                  F.col(type_col).alias("_k")))
    is_touch = F.col("_k").isin(list(touch_types))
    w = (Window.partitionBy("_u").orderBy("_ts")
         .rangeBetween(-int(lookback_us), 0))
    marked = ev.select(
        "*",
        F.min(F.when(is_touch, F.struct("_ts", "_id", "_k")))
        .over(w).alias("_first"),
        F.max(F.when(is_touch, F.struct("_ts", "_id", "_k")))
        .over(w).alias("_last"))
    conv = marked.where(F.col("_k") == conversion_type)
    # ONE window evaluation feeding both models: explode each
    # conversion into its two (model, channel) credits and aggregate
    # once — a per-model union would re-run the sort+window per branch
    credits = conv.select(F.explode(F.array(
        F.struct(F.lit("first_touch").alias("model"),
                 F.coalesce(F.col("_first._k"), F.lit("none"))
                 .alias("channel")),
        F.struct(F.lit("last_touch").alias("model"),
                 F.coalesce(F.col("_last._k"), F.lit("none"))
                 .alias("channel")))).alias("_c"))
    return (credits.select("_c.model", "_c.channel")
            .groupBy("model", "channel")
            .agg(F.count(F.lit(1)).alias("n_conversions")))


def sequence_conformance(df: DataFrame, key_col: str,
                         order_cols: list[str], state_col: str,
                         allowed: list[tuple[str, str]]) -> DataFrame:
    """Process-conformance check: count the observed per-key state
    transitions that are NOT in the ``allowed`` set — the validation
    pass behind event-instrumentation QA and workflow auditing.

    Same single window shuffle as :func:`transition_matrix`; the
    allowed set is a literal broadcast anti-join against the tiny
    aggregated (from, to) grid, so conformance costs nothing beyond
    the transition count itself.
    """
    if not allowed:
        raise ValueError("sequence_conformance needs a non-empty "
                         "allowed set")
    spark = df.sparkSession
    steps = state_transitions(df, key_col, order_cols, state_col)
    counts = (steps.groupBy("from_state", "to_state")
              .agg(F.count(F.lit(1)).alias("n_violations")))
    ok = spark.createDataFrame(list(allowed),
                               "from_state string, to_state string")
    return counts.join(F.broadcast(ok), ["from_state", "to_state"],
                       "left_anti")


def burst_detection(df: DataFrame, type_col: str, bucket: Column,
                    min_count: int = 10, factor: float = 2.0,
                    trailing: int = 24, fill_gaps: bool = False,
                    max_buckets: int = 1_000_000) -> DataFrame:
    """Temporal burst detection: per (type, time bucket), flag buckets
    whose event count exceeds ``factor ×`` the trailing-``trailing``-
    bucket mean (current bucket excluded) with at least ``min_count``
    events — the monitoring primitive behind spike alerts and
    trending-topic surfacing.

    One hash aggregate to the (type, bucket) grid, then a rows-frame
    window over that GRID (types × buckets rows, not events).  The
    trailing mean is an exact-integer sum over the frame divided once,
    so the flag predicate is engine-exact; buckets with no trailing
    history (frame empty) are never flagged.

    By default the frame spans the last ``trailing`` OBSERVED buckets;
    on sparse streams that reaches back across silent gaps and biases
    the baseline high (a spike after total silence can hide behind
    last week's busy buckets).  ``fill_gaps=True`` zero-fills each
    type's bucket span first (the ``densify_time_buckets`` treatment,
    inline), making the frame a true trailing time window;
    ``max_buckets`` fails LOUDLY if one type's span would densify
    wider than that (the corrupt-epoch guard).
    """
    if trailing < 1 or min_count < 1 or factor <= 0:
        # trailing=0 builds rowsBetween(0, -1) and dies deep inside
        # Spark with a window-frame AnalysisException naming nothing —
        # name the mistake at the entry like the sibling operators
        # (the lag_features rule, r15 review)
        raise ValueError(
            f"need trailing >= 1, min_count >= 1, factor > 0 "
            f"(got trailing={trailing}, min_count={min_count}, "
            f"factor={factor})")
    counts = (df.select(F.col(type_col).alias("_t"), bucket.alias("_b"))
              .groupBy("_t", "_b")
              .agg(F.count(F.lit(1)).alias("n_events")))
    if fill_gaps:
        spans = counts.groupBy("_t").agg(F.min("_b").alias("_lo"),
                                         F.max("_b").alias("_hi"))
        span_ok = F.assert_true(
            F.col("_hi") - F.col("_lo") < F.lit(int(max_buckets)),
            F.concat(F.lit("burst span over max_buckets for type "),
                     F.col("_t").cast("string")))
        lo_checked = F.coalesce(span_ok.cast("long"), F.col("_lo"))
        grid = spans.select(
            "_t", F.explode(F.sequence(lo_checked, F.col("_hi")))
            .alias("_b"))
        # eqNullSafe on the type (the densify_time_buckets rule, r15
        # review): a null-unsafe grid join zeroed a NULL type's real
        # counts, so fill_gaps=True silently DISABLED burst detection
        # for exactly the broken-instrumentation stream it should
        # flag; fill_gaps=False flagged the same data
        g, c0 = grid.alias("g"), counts.alias("c0")
        counts = (g.join(c0, F.col("g._t").eqNullSafe(F.col("c0._t"))
                         & (F.col("g._b") == F.col("c0._b")), "left")
                  .select(F.col("g._t").alias("_t"),
                          F.col("g._b").alias("_b"),
                          F.coalesce(F.col("c0.n_events"), F.lit(0))
                          .alias("n_events")))
    w = (Window.partitionBy("_t").orderBy("_b")
         .rowsBetween(-trailing, -1))
    from ..functions.vectors import round4
    trail_sum = F.sum("n_events").over(w)
    trail_cnt = F.count("n_events").over(w)
    marked = counts.select(
        "_t", "_b", "n_events",
        (trail_sum.cast("double") / trail_cnt).alias("_mean"),
        trail_cnt.alias("_tc"))
    return (marked
            .where((F.col("_tc") > 0)
                   & (F.col("n_events") >= F.lit(int(min_count)))
                   & (F.col("n_events")
                      > F.lit(float(factor)) * F.col("_mean")))
            .select(F.col("_t").alias(type_col),
                    F.col("_b").alias("bucket"), "n_events",
                    round4(F.col("_mean")).alias("trailing_mean")))


def ewma_features(df: DataFrame, key_col: str, order_cols: list[str],
                  value_col: str, window_rows: int = 20) -> DataFrame:
    """Per-key exponentially-weighted moving average (half-life decay,
    alpha = 1/2) over the last ``window_rows`` events — the standard
    recency-weighted feature a training pipeline derives from metric
    streams.

    Engine-exact by construction: the decay is a LEFT FOLD
    ``acc' = acc·0.5 + x·0.5`` over the rows-frame values in frame
    order.  Multiplying by 0.5 is an exponent shift (always exact in
    IEEE), and both engines run the same add sequence in the same
    order, so the result is bit-identical with no libm pow() and no
    quantization tricks — the SQL twin is ``list_reduce`` over the
    same frame with the same zero.  The truncated tail beyond the
    frame carries weight 2^-window_rows (≈1e-6 at 20) IDENTICALLY on
    both sides — it is part of the definition, not an approximation.

    One shuffle on ``key_col``; the frame collect and fold are
    JVM-side higher-order functions.  ``order_cols`` must be a total
    order (ts + id), otherwise the frame contents are
    nondeterministic.
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    w = (Window.partitionBy(key_col).orderBy(*order_cols)
         .rowsBetween(-(window_rows - 1), 0))
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    fold = F.aggregate(arr, F.lit(0.0),
                       lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5))
    from ..functions.vectors import round4
    return (df.where(F.col(value_col).isNotNull())
            .select(F.col(key_col), *[F.col(c) for c in order_cols],
                    round4(fold).alias("ewma")))


def target_encode_loo(df: DataFrame, cat_col: str, target_col: str,
                      id_col: str) -> DataFrame:
    """Leave-one-out target encoding: each row's category feature is
    the mean of the target over the OTHER rows of its category —
    ``(Σ_group − x) / (n_group − 1)`` — the standard leakage-safe
    categorical encoder for gradient-boosted / linear models.

    Exactness: the target is quantized to integer centi-units first,
    so the group sum is an order-free BIGINT and the encoder is one
    exact integer subtraction and ONE double division per row —
    bit-identical across engines (then round4 for the hash surface).
    A singleton category has no "other rows": its encoding is NULL
    (explicit, rather than a divide-by-zero or a global-mean fallback
    the caller didn't ask for).

    One hash aggregate on the category (map-side combine) + one join
    of the category stats back onto the rows — no window over the
    full data.  The join is deliberately NOT hint-forced: a
    low-cardinality encoder broadcasts under the optimizer's size
    threshold anyway, while the canonical high-cardinality case
    (user ids, zip codes — millions of stats rows) must be free to
    shuffle instead of OOMing the driver on a forced broadcast
    (code-review r6).
    """
    from ..functions.vectors import round4
    xc = F.floor(F.col(target_col).cast("double") * 100 + F.lit(0.5)) \
          .cast("long")
    base = df.select(F.col(id_col), F.col(cat_col), xc.alias("_xc"))
    # count the OBSERVED targets, not the rows: count(1) counted
    # NULL-target rows into the LOO denominator while sum() skipped
    # them from the numerator, deflating every encoding in the
    # category (and a category whose only sibling targets are NULL
    # must encode NULL — there are no "other rows" to average) —
    # count(_xc) skips NULLs on both engine sides (r15 review)
    stats = (base.groupBy(cat_col)
             .agg(F.sum("_xc").alias("_sum"),
                  F.count("_xc").alias("_n")))
    loo = F.when(
        F.col("_n") > 1,
        round4(((F.col("_sum") - F.col("_xc")).cast("double") / 100.0)
               / (F.col("_n") - 1).cast("double")))
    # eqNullSafe: a null-unsafe equi-join silently DROPPED every
    # NULL-category row from the output (r13 review, verified — the
    # robust_stats docstring names this exact pattern); NULL is a
    # legitimate category and gets its own LOO stats
    st = stats.select(F.col(cat_col).alias("_cat"), "_sum", "_n")
    return (base.join(st, F.col(cat_col).eqNullSafe(F.col("_cat")))
            .select(id_col, cat_col, loo.alias("target_loo")))


def robust_stats(df: DataFrame, group_col: str, value_col: str,
                 outlier_k: int = 3) -> DataFrame:
    """Per-group robust dispersion: nearest-rank median, MAD (median
    absolute deviation) and the count of points beyond ``outlier_k``
    MADs — the outlier screen that, unlike mean/stddev z-scores, a
    single corrupt value cannot drag.

    Everything is exact integer arithmetic on centi-units: medians are
    nearest-rank SELECTED values (never interpolated), deviations are
    integer subtractions, and the outlier cut ``|x − med| > k·MAD`` is
    an integer comparison — so both engines agree bit-for-bit with no
    consistency-constant float multiply (scale MAD by 1.4826 yourself
    if you need the σ-consistent estimator).

    Two window passes share one shuffle on ``group_col`` (rank by
    value, then rank by deviation under the same partitioning; the
    selected median/MAD spread back over their partition as window
    aggregates, never a join), and the final reduce is a hash
    aggregate on the group.  Join-free on purpose: an equi-join on
    the group would silently DROP a NULL group (null-unsafe keys),
    while window partitions and GROUP BY keep it — code-review r6.
    """
    if outlier_k < 1:
        raise ValueError("outlier_k must be >= 1")
    xc = F.floor(F.col(value_col).cast("double") * 100 + F.lit(0.5)) \
          .cast("long")
    base = (df.where(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("_g"), xc.alias("_xc")))
    wg = Window.partitionBy("_g")
    ranked = base.select(
        "_g", "_xc",
        F.row_number().over(wg.orderBy("_xc")).alias("_rn"),
        F.count(F.lit(1)).over(wg).alias("_n"))
    med = F.max(F.when(F.col("_rn") == F.expr("(_n + 1) div 2"),
                       F.col("_xc"))).over(wg)
    dev = (ranked.select("_g", "_xc", med.alias("_med"))
           .withColumn("_dev", F.abs(F.col("_xc") - F.col("_med"))))
    dranked = dev.select(
        "_g", "_med", "_dev",
        F.row_number().over(wg.orderBy("_dev")).alias("_rn"),
        F.count(F.lit(1)).over(wg).alias("_n"))
    mad = F.max(F.when(F.col("_rn") == F.expr("(_n + 1) div 2"),
                       F.col("_dev"))).over(wg)
    return (dranked.withColumn("_mad", mad)
            .groupBy("_g", "_med", "_mad")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.when(F.col("_dev")
                              > outlier_k * F.col("_mad"), 1)
                       .otherwise(0)).alias("n_outliers"))
            .select(F.col("_g").alias(group_col), "n_rows",
                    (F.col("_med").cast("double") / 100).alias("median"),
                    (F.col("_mad").cast("double") / 100).alias("mad"),
                    "n_outliers"))


def rfm_scores(df: DataFrame, key_col: str, ts_us_col: str,
               value_col: str, n_tiles: int = 5) -> DataFrame:
    """RFM (recency / frequency / monetary) quantile scoring per
    entity — the classic engagement-segmentation operator, and the
    shape every per-user quality-tier assignment takes (score users,
    ntile them, act on the segment).

    One hash aggregate computes the three per-key metrics (max event
    time, event count, micro-unit value sum — all exact integers),
    then three ``ntile`` windows over the KEY frame (one row per key,
    not per event) assign 1..n_tiles scores.  Ordering is made total
    with the key as tie-break, so tile boundaries are deterministic
    and engine-independent; ``ntile``'s fill rule (first ``n mod t``
    tiles take the extra row) is the same in Spark and DuckDB.
    Recency orders ASCENDING on last-seen (tile 1 = coldest), so all
    three scores read "higher = more engaged".

    Scale: the windows are global over distinct keys — at 100 TB the
    per-key frame is the small output of the aggregate, and a total
    sort of keys is the price of exact global quantiles; for
    approximate tiers at extreme key cardinality, bucket on
    ``percentile_approx`` cuts instead (the sketch path, see
    query_approx_percentiles).
    """
    # NULL guards: a NULL event time cannot contribute recency
    # (max() skips it), but the EVENT still counts and its value is
    # real mass — the old row filter understated f/m scores and made
    # keys with only NULL-ts events vanish (r13 review).  Recency
    # ordering coalesces a NULL last-seen to -1 (< any epoch micro),
    # deterministically coldest in BOTH engines — NULLS FIRST (Spark)
    # vs NULLS LAST (DuckDB) would otherwise shift tile boundaries.
    # A NULL value counts as zero mass rather than nulling the sum.
    m = (df.groupBy(key_col)
         .agg(F.max(F.col(ts_us_col)).alias("last_us"),
              F.count(F.lit(1)).alias("n_events"),
              F.sum(F.coalesce(F.col(value_col), F.lit(0)))
              .alias("value_u")))
    # asc_nulls_last on the key tie-break: Spark ASC defaults NULLS
    # FIRST while DuckDB defaults NULLS LAST, so a NULL-key group
    # tying a non-null key at a tile boundary shifted scores
    # cross-engine (the key_skew_profile rule, r15 review; the SQL
    # twin's bare ASC is already NULLS LAST)
    k = F.asc_nulls_last(F.col(key_col))
    r_w = Window.orderBy(F.coalesce(F.col("last_us"), F.lit(-1)).asc(),
                         k)
    f_w = Window.orderBy(F.col("n_events").asc(), k)
    m_w = Window.orderBy(F.col("value_u").asc(), k)
    return m.select(
        key_col, "last_us", "n_events", "value_u",
        F.ntile(n_tiles).over(r_w).alias("r_score"),
        F.ntile(n_tiles).over(f_w).alias("f_score"),
        F.ntile(n_tiles).over(m_w).alias("m_score"))


def rfm_scores_sql(key: str, ts_us: str, value_u: str,
                   from_table: str, n_tiles: int = 5) -> str:
    """DuckDB twin of :func:`rfm_scores` (same total orderings, same
    ntile fill rule)."""
    return f"""
        WITH m AS (
            SELECT {key},
                   max({ts_us}) AS last_us,
                   count(*) AS n_events,
                   CAST(sum(coalesce({value_u}, 0)) AS BIGINT) AS value_u
            FROM {from_table}
            GROUP BY {key})
        SELECT {key}, last_us, n_events, value_u,
               ntile({n_tiles}) OVER (
                   ORDER BY coalesce(last_us, -1) ASC, {key})
                   AS r_score,
               ntile({n_tiles}) OVER (ORDER BY n_events ASC, {key})
                   AS f_score,
               ntile({n_tiles}) OVER (ORDER BY value_u ASC, {key})
                   AS m_score
        FROM m
    """


def auc_exact(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC-AUC from rank statistics (the Mann-Whitney U
    identity) — the evaluation every learned quality/toxicity filter
    needs before it gates a corpus, computed without thresholds,
    curves, or floats until the single final division:

        AUC = (Σ R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻)

    with midranks for ties.  Everything stays integral: doubling the
    midrank gives ``2·R = 2·minrank + ties − 1`` (an integer), so the
    numerator ``Σ 2R⁺ − n⁺(n⁺+1)`` and denominator ``2·n⁺·n⁻`` are
    exact BIGINTs and the one division is bit-identical cross-engine
    after round4.  NULL scores are excluded (unrankable).

    Scale: one global rank over the scored rows — the exact price; at
    extreme row counts (n ≳ 3e9) the rank sums approach BIGINT range
    and the sketch path (fixed-grid score histogram → trapezoid AUC)
    is the production fallback.  Output is a single row:
    ``n_pos, n_neg, auc``.
    """
    from ..functions.vectors import round4

    s = F.col(score_col)
    # NULL labels are unrankable like NULL scores — without the
    # filter they fell into otherwise(1) and counted as NEGATIVES,
    # inflating n_neg and depressing every positive's rank (r13
    # review, verified).  The filter must ALSO run post-cast: on a
    # non-ANSI session a malformed label ('maybe') passes the raw
    # isNotNull, casts to NULL boolean, and re-enters otherwise(1) —
    # the same bias through the back door (r15 review).  On ANSI
    # sessions (the oracle contract) a malformed cast RAISES, so the
    # post-cast filter is a no-op there and the strict-cast SQL twin
    # needs no counterpart.
    scored = (df.where(s.isNotNull()
                       & F.col(label_col).isNotNull())
              .select(s.alias("_s"),
                      F.col(label_col).cast("boolean").alias("_pos"))
              .where(F.col("_pos").isNotNull()))
    w_rank = Window.orderBy("_s")
    w_ties = Window.partitionBy("_s")
    r = scored.select(
        "_pos",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties)
         - F.lit(1)).alias("_2r"))
    agg = r.agg(
        F.sum(F.when(F.col("_pos"), F.col("_2r"))).alias("_sum2r_pos"),
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("n_neg"))
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        round4((F.col("_sum2r_pos")
                - F.col("n_pos") * (F.col("n_pos") + 1))
               / (2 * F.col("n_pos") * F.col("n_neg"))))
    return agg.select("n_pos", "n_neg", auc.alias("auc"))


def auc_exact_sql(score: str, label: str, from_table: str) -> str:
    """DuckDB twin of :func:`auc_exact` (same midrank identity)."""
    return f"""
        WITH scored AS (
            SELECT {score} AS s, CAST({label} AS BOOLEAN) AS pos
            FROM {from_table}
            WHERE {score} IS NOT NULL AND {label} IS NOT NULL),
        r AS (SELECT pos,
                     2 * rank() OVER (ORDER BY s)
                     + count(*) OVER (PARTITION BY s) - 1 AS r2
              FROM scored),
        a AS (SELECT CAST(sum(CASE WHEN pos THEN r2 END) AS BIGINT)
                         AS sum2r_pos,
                     CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_pos,
                     CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END)
                         AS BIGINT) AS n_neg
              FROM r)
        SELECT n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   floor((sum2r_pos - n_pos * (n_pos + 1))
                         / (2.0 * n_pos * n_neg) * 10000 + 0.5) / 10000
               END AS auc
        FROM a
    """


def seasonal_naive_eval(df: DataFrame, key_col: str, ts_us_col: str,
                        value_col: str,
                        season_buckets: int = 168,
                        bucket_us: int = 3_600_000_000) -> DataFrame:
    """Seasonal-naive forecast baseline + exact error report: bucket
    the stream (hourly by default), forecast each bucket as the value
    one season ago (168 h = weekly), and report per-key MAE/bias over
    the evaluable buckets — the sanity floor every anomaly detector
    and capacity forecast is judged against.

    All integer arithmetic: micro-unit bucket sums, lag by season,
    |error| and signed-error sums stay BIGINT; the two final ``/n``
    divisions are the only floats (round4).  Buckets with no
    predecessor a season earlier are excluded from the error (not
    zero-filled — absence of history is not a zero forecast).  One
    shuffle on the key for the bucket aggregate; the shifted-bucket
    equi-join rides the same (key) partitioning.

    NULL keys are EXCLUDED explicitly (r15 review): an unkeyed series
    previously vanished in the null-unsafe self-join on BOTH engine
    sides — same result, but silently; the filter makes the contract
    visible (key your stream before evaluating it).
    """
    from ..functions.vectors import round4

    b = (df.where(F.col(value_col).isNotNull()
                  & F.col(key_col).isNotNull())
         .select(F.col(key_col).alias("k"),
                 F.expr(f"{ts_us_col} div {int(bucket_us)}")
                 .alias("bucket"),
                 F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5))
                 .cast("long").alias("v_u"))
         .groupBy("k", "bucket")
         .agg(F.sum("v_u").alias("actual_u")))
    # self-join on the shifted bucket key, NOT a row-offset lag: a
    # row-lag only means "one season ago" when every bucket of the
    # season is occupied, which sparse streams never guarantee — the
    # equi-join is exact regardless of gaps and rides the same (k)
    # partitioning as the aggregate
    season = b.select(
        F.col("k"),
        (F.col("bucket") + F.lit(int(season_buckets))).alias("bucket"),
        F.col("actual_u").alias("forecast_u"))
    ev = b.join(season, ["k", "bucket"])
    return (ev.groupBy(F.col("k").alias(key_col))
            .agg(F.count(F.lit(1)).alias("n_buckets"),
                 round4(F.sum(F.abs(F.col("actual_u")
                                    - F.col("forecast_u")))
                        / (F.count(F.lit(1)) * 1e6)).alias("mae"),
                 round4(F.sum(F.col("actual_u") - F.col("forecast_u"))
                        / (F.count(F.lit(1)) * 1e6)).alias("bias")))


def seasonal_naive_eval_sql(key: str, ts_us: str, value: str,
                            from_table: str,
                            season_buckets: int = 168,
                            bucket_us: int = 3_600_000_000) -> str:
    """DuckDB twin of :func:`seasonal_naive_eval`."""
    return f"""
        WITH b AS (
            SELECT {key} AS k, ({ts_us}) // {int(bucket_us)} AS bucket,
                   CAST(sum(CAST(floor({value} * 1000000 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS actual_u
            FROM {from_table}
            WHERE {value} IS NOT NULL
            GROUP BY 1, 2),
        ev AS (SELECT b.k, b.actual_u, s.actual_u AS forecast_u
               FROM b JOIN b s
                 ON b.k = s.k
                AND b.bucket = s.bucket + {season_buckets})
        SELECT k AS {key}, count(*) AS n_buckets,
               floor(sum(abs(actual_u - forecast_u))
                     / (count(*) * 1e6) * 10000 + 0.5) / 10000 AS mae,
               floor(sum(actual_u - forecast_u)
                     / (count(*) * 1e6) * 10000 + 0.5) / 10000 AS bias
        FROM ev GROUP BY k
    """


def cusum_changepoint(df: DataFrame, key_col: str, order_cols: list[str],
                      value_col: str) -> DataFrame:
    """Single level-shift changepoint per series, CUSUM-style: the
    position maximizing the absolute centered prefix deviation
    ``|n·P_i − i·T|`` (P = prefix sum, T = series total, n = length) —
    the classic "where did the level shift" estimator (Page 1954's
    cumulative-sum statistic, evaluated exactly), multiplied through
    by ``n`` so no mean is ever divided out and every comparison is
    BIGINT-exact.  The reported ``deviation`` is the normalized
    ``|n·P − i·T| / (n·i·(n−i))``-free simple form ``|nP − iT|/n`` in
    value units (round4) — monotone in the statistic, so the argmax
    is the same point.

    One shuffle on the key; prefix sums and the argmax ride a single
    window sort.  Ties break on earliest position.  Series of length
    < 2 produce no row (no interior point).  The ``n·P`` / ``i·T``
    products run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — BIGINT
    would overflow at only ~4e5 rows per key for typical micro-unit
    magnitudes; the final normalized deviation is one int→double
    conversion (uniquely defined in IEEE, identical both engines) and
    one division.
    """
    from ..functions.vectors import round4

    v_u = F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5)).cast("long")
    base = (df.where(F.col(value_col).isNotNull())
            .select(F.col(key_col).alias("k"),
                    *[F.col(c) for c in order_cols],
                    v_u.alias("v_u")))
    w = Window.partitionBy("k").orderBy(*order_cols)
    wk = Window.partitionBy("k")
    pre = base.select(
        "k", *order_cols,
        F.sum("v_u").over(w).alias("p"),
        F.row_number().over(w).alias("i"),
        F.sum("v_u").over(wk).alias("t"),
        F.count(F.lit(1)).over(wk).alias("n"))
    # DECIMAL(38,0) products: n·P crosses BIGINT at ~4e5 rows/key for
    # 5e7-micro-unit values (well inside real scale); 128-bit keeps the
    # argmax exact and mirrors the oracle's HUGEINT widening
    dev = pre.where(F.col("i") < F.col("n")).select(
        "k", *order_cols, "i", "n",
        F.expr("abs(CAST(n AS DECIMAL(38,0)) * p "
               "- CAST(i AS DECIMAL(38,0)) * t)").alias("_d"))
    w_pick = Window.partitionBy("k").orderBy(F.col("_d").desc(),
                                             F.col("i").asc())
    return (dev.withColumn("_rk", F.row_number().over(w_pick))
            .where(F.col("_rk") == 1)
            .select(F.col("k").alias(key_col), *order_cols,
                    F.col("i").alias("position"),
                    F.col("n").alias("series_len"),
                    round4(F.col("_d").cast("double")
                           / (F.col("n") * F.lit(1e6)))
                    .alias("deviation")))


def cusum_changepoint_sql(key: str, order_exprs: list[tuple[str, str]],
                          value: str, from_table: str) -> str:
    """DuckDB twin of :func:`cusum_changepoint`.  ``order_exprs`` are
    (SQL expression, output name) pairs so computed order columns
    (e.g. ``epoch_us(ts)``) surface under the same names as the Spark
    side's aliased columns."""
    sel = ", ".join(f"{e} AS {n}" for e, n in order_exprs)
    oc = ", ".join(n for _, n in order_exprs)
    return f"""
        WITH base AS (
            SELECT {key} AS k, {sel},
                   CAST(floor({value} * 1000000 + 0.5) AS BIGINT) AS v_u
            FROM {from_table} WHERE {value} IS NOT NULL),
        pre AS (SELECT k, {oc},
                       sum(v_u) OVER (PARTITION BY k ORDER BY {oc}
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS p,
                       row_number() OVER (PARTITION BY k
                                          ORDER BY {oc}) AS i,
                       sum(v_u) OVER (PARTITION BY k) AS t,
                       count(*) OVER (PARTITION BY k) AS n
                FROM base),
        dev AS (SELECT k, {oc}, i, n,
                       abs(CAST(n AS HUGEINT) * p
                           - CAST(i AS HUGEINT) * t) AS d
                FROM pre WHERE i < n),
        pick AS (SELECT *, row_number() OVER (PARTITION BY k
                           ORDER BY d DESC, i ASC) AS rk
                 FROM dev)
        SELECT k AS {key}, {oc},
               CAST(i AS BIGINT) AS position,
               CAST(n AS BIGINT) AS series_len,
               floor(d / (n * 1e6) * 10000 + 0.5) / 10000 AS deviation
        FROM pick WHERE rk = 1
    """


def km_survival(df: DataFrame, duration_col: str,
                event_col: str) -> DataFrame:
    """Kaplan-Meier survival curve (Kaplan & Meier 1958): per distinct
    duration bucket t, the at-risk count n_t, event count d_t, and the
    product-limit estimate ``S(t) = Π_{s≤t} (1 − d_s/n_s)`` — the
    churn/retention curve with correct censoring handling (a subject
    censored at t leaves the risk set but contributes no event).

    Exactness: each factor is one IEEE division + subtraction of
    exact BIGINT counts, and the running product is a SEQUENTIAL fold
    over the duration-ordered factor array — multiplication is
    correctly rounded, so the fold is bit-identical to the oracle's
    ``list_reduce`` (the EWMA precedent), no exp(Σ ln) drift.

    Scale shape: one hash aggregate per duration bucket, a window
    suffix-sum for the risk sets, then the bucket frame (bounded: one
    row per DISTINCT duration, pick a bucketing that keeps it in the
    thousands) collapses to a single ordered array whose running
    products are folded per row — O(buckets²) multiplications, driver
    never involved.  ``event_col`` must be 0/1 integral; NULL
    durations are excluded.
    """
    from ..functions.vectors import round4

    base = (df.where(F.col(duration_col).isNotNull())
            .select(F.col(duration_col).cast("long").alias("t"),
                    F.col(event_col).cast("long").alias("e")))
    per_t = base.groupBy("t").agg(
        F.sum("e").alias("d"),
        F.count(F.lit(1)).alias("c"))
    w_prev = (Window.orderBy("t")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    r = per_t.select(
        "t", "d", "c",
        (F.sum("c").over(w_all)
         - F.coalesce(F.sum("c").over(w_prev), F.lit(0))).alias("n"))
    factor = (F.lit(1.0) - F.col("d") / F.col("n")).cast("double")
    one = (r.select(F.struct("t", "d", "n", factor.alias("f"))
                    .alias("s"))
           .agg(F.sort_array(F.collect_list("s")).alias("arr")))
    exploded = one.select("arr", F.posexplode("arr").alias("idx", "s"))
    surv = F.aggregate(
        F.slice(F.expr("transform(arr, x -> x.f)"), F.lit(1),
                F.col("idx") + 1),
        F.lit(1.0).cast("double"), lambda acc, x: acc * x)
    return exploded.select(
        F.col("s.t").alias("duration"),
        F.col("s.n").alias("n_at_risk"),
        F.col("s.d").alias("d_events"),
        round4(surv).alias("survival"))


def km_survival_sql(duration: str, event: str, from_table: str) -> str:
    """DuckDB twin of :func:`km_survival` (same counts, same ordered
    sequential product fold — bit-identical multiplication chain)."""
    return f"""
        WITH base AS (
            SELECT CAST({duration} AS BIGINT) AS t,
                   CAST({event} AS BIGINT) AS e
            FROM {from_table} WHERE {duration} IS NOT NULL),
        per_t AS (SELECT t, CAST(sum(e) AS BIGINT) AS d,
                         count(*) AS c
                  FROM base GROUP BY t),
        r AS (SELECT t, d, c,
                     sum(c) OVER () - coalesce(sum(c) OVER (
                         ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n
              FROM per_t),
        arrs AS (SELECT list(t ORDER BY t) AS ts,
                        list(CAST(n AS BIGINT) ORDER BY t) AS ns,
                        list(d ORDER BY t) AS ds,
                        list(CAST(1.0 - d / CAST(n AS DOUBLE)
                                  AS DOUBLE) ORDER BY t) AS fs
                 FROM r)
        SELECT ts[i] AS duration, ns[i] AS n_at_risk, ds[i] AS d_events,
               floor(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                                              fs[1:i]),
                                 (acc, x) -> acc * x) * 10000 + 0.5)
               / 10000 AS survival
        FROM arrs, unnest(range(1, len(ts) + 1)) AS u(i)
    """


def funnel_windowed(df: DataFrame, user_col: str, ts_col: str,
                    type_col: str, steps: list[str],
                    max_gap: int) -> DataFrame:
    """Time-constrained ordered funnel: step k counts only when it
    first completes within ``max_gap`` (same units as ``ts_col``)
    AFTER step k−1's first completion — the conversion-window funnel
    ("purchased within an hour of clicking"); thin wrapper over
    :func:`funnel` so the two shapes cannot drift apart.  Integral
    timestamps (epoch micros) keep the gap arithmetic exact in both
    engines.
    """
    if max_gap <= 0:
        raise ValueError("max_gap must be positive")
    return funnel(df, user_col, ts_col, type_col, steps,
                  max_gap=max_gap)


def funnel_windowed_sql(user: str, ts_us: str, typ: str,
                        steps: list[str], max_gap: int,
                        from_table: str) -> str:
    """DuckDB twin of :func:`funnel_windowed`."""
    ctes, prev = [], None
    for i, step in enumerate(steps, start=1):
        if prev is None:
            ctes.append(
                f"s{i} AS (SELECT e.{user} AS u, min({ts_us}) AS ft "
                f"FROM {from_table} e WHERE e.{typ} = '{step}' "
                f"GROUP BY e.{user})")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{user} AS u, min({ts_us}) AS ft "
                f"FROM {from_table} e JOIN {prev} ON e.{user} = {prev}.u "
                f"WHERE e.{typ} = '{step}' AND {ts_us} > {prev}.ft "
                f"AND {ts_us} <= {prev}.ft + {int(max_gap)} "
                f"GROUP BY e.{user})")
        prev = f"s{i}"
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step_idx, '{s}' AS step, "
        f"(SELECT count(*) FROM s{i}) AS n_users"
        for i, s in enumerate(steps, start=1))
    return "WITH " + ", ".join(ctes) + " " + selects


def cohort_value(df: DataFrame, user_col: str, day: Column,
                 value_u: Column) -> DataFrame:
    """Cohort LTV curve: users grouped by first-activity day, then per
    (cohort_day, day_offset) the active-user count, the exact
    micro-unit value contributed that offset, and the cohort's
    CUMULATIVE value — the revenue companion to
    :func:`cohort_retention` (which counts heads, not value).

    Shape: per-(user, day) value pre-aggregation (collapses event
    volume), per-user min-day hash agg, one equi-join back on user,
    a (cohort, offset) grid agg, then a window prefix-sum over the
    tiny grid.  All value arithmetic stays BIGINT; the one division
    (value per active user) is round4 on exact integers.
    """
    from ..functions.vectors import round4

    # NULL users excluded explicitly, both engine sides — the
    # cohort_retention rule (r15 review): anonymous value previously
    # vanished in the null-unsafe join with no trace
    act = (df.where(F.col(user_col).isNotNull())
           .select(F.col(user_col).alias("_u"), day.alias("_d"),
                   value_u.alias("_v"))
           .groupBy("_u", "_d").agg(F.sum("_v").alias("_dv")))
    cohorts = act.groupBy("_u").agg(F.min("_d").alias("_cohort"))
    grid = (act.join(cohorts, "_u")
            .groupBy(F.col("_cohort").alias("cohort_day"),
                     (F.col("_d") - F.col("_cohort")).alias("day_offset"))
            .agg(F.count(F.lit(1)).alias("n_active"),
                 F.sum("_dv").alias("value_u")))
    w = (Window.partitionBy("cohort_day").orderBy("day_offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return grid.select(
        "cohort_day", "day_offset", "n_active", "value_u",
        F.sum("value_u").over(w).alias("cum_value_u"),
        round4(F.col("value_u")
               / (F.col("n_active") * F.lit(1e6)))
        .alias("value_per_active"))


def cohort_value_sql(user: str, day: str, value_u: str,
                     from_table: str) -> str:
    """DuckDB twin of :func:`cohort_value`."""
    return f"""
        WITH act AS (
            SELECT {user} AS u, {day} AS d,
                   CAST(sum({value_u}) AS BIGINT) AS dv
            FROM {from_table}
            WHERE {user} IS NOT NULL
            GROUP BY 1, 2),
        cohorts AS (SELECT u, min(d) AS cohort FROM act GROUP BY u),
        grid AS (SELECT cohort AS cohort_day,
                        d - cohort AS day_offset,
                        count(*) AS n_active,
                        CAST(sum(dv) AS BIGINT) AS value_u
                 FROM act JOIN cohorts USING (u)
                 GROUP BY 1, 2)
        SELECT cohort_day, day_offset, n_active, value_u,
               CAST(sum(value_u) OVER (PARTITION BY cohort_day
                    ORDER BY day_offset ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_value_u,
               floor(value_u / (n_active * 1e6) * 10000 + 0.5) / 10000
                   AS value_per_active
        FROM grid
    """


def interval_union(df: DataFrame, key_col: str, start_col: str,
                   end_col: str) -> DataFrame:
    """Merge overlapping (or touching) integer intervals per key —
    the gaps-and-islands primitive behind session stitching,
    coverage/uptime accounting, and span consolidation.  Returns per
    key: the merged-island count, total covered units, and the longest
    single island.

    MERGE semantics treat bounds as closed (intervals touching at a
    point join one island: the island test is ``start > running max
    end``, not ``>=``); COVERAGE is half-open — ``covered`` and
    ``longest`` are ``island_end - island_start``, i.e. [s, e) length,
    so a point interval [5, 5] covers 0 units.  This is the natural
    convention for timestamp spans (end = first instant NOT covered);
    callers wanting closed-length coverage add islands x 1 unit
    themselves.

    Shape: one window pass per key ordered by (start, end) — a row
    starts a new island iff its start exceeds the running max of all
    previous ends — then a (key, island) agg and a per-key agg.  No
    self-join: the classic O(n²) overlap join is replaced by the
    running-max scan, so cost is one shuffle on the key plus sort.
    Integer bounds keep every engine bit-exact (quantize timestamps
    to epoch micros before calling).
    """
    # NULL-bound rows are excluded up front (same posture as
    # range_join_binned): an open-ended interval carries no measurable
    # span, and without this filter assert_true's NULL predicate would
    # abort the whole job with a misleading "inverted interval"
    # message (r13 advice).  The SQL twin applies the identical
    # filter, which also sidesteps Spark-NULLS-FIRST vs
    # DuckDB-NULLS-LAST window-order divergence on NULL starts.
    df = df.where(F.col(start_col).isNotNull()
                  & F.col(end_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    runmax = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    # loud inversion guard (same coalesce-over-assert_true trick as
    # range_join_binned): one corrupt end < start row would otherwise
    # contribute NEGATIVE covered/longest downstream with no error
    # (r13 review)
    inv_ok = F.assert_true(
        F.col(end_col) >= F.col(start_col),
        F.lit(f"inverted interval: {end_col} < {start_col}"))
    flagged = df.select(
        F.col(key_col).alias("_k"), F.col(start_col).alias("_s"),
        F.coalesce(inv_ok.cast("long"), F.col(end_col)).alias("_e"),
        F.when(runmax.isNull() | (F.col(start_col) > runmax), 1)
        .otherwise(0).alias("_new"))
    wi = Window.partitionBy("_k").orderBy("_s", "_e") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = (flagged
               .withColumn("_isl", F.sum("_new").over(wi))
               .groupBy("_k", "_isl")
               .agg(F.min("_s").alias("_is"), F.max("_e").alias("_ie")))
    return (islands.groupBy(F.col("_k").alias(key_col))
            .agg(F.count(F.lit(1)).alias("n_islands"),
                 F.sum(F.col("_ie") - F.col("_is")).alias("covered"),
                 F.max(F.col("_ie") - F.col("_is")).alias("longest")))


def interval_union_sql(key: str, start: str, end: str,
                       from_table: str) -> str:
    """DuckDB twin of :func:`interval_union`."""
    return f"""
        WITH iv AS (SELECT {key} AS k, {start} AS s, {end} AS e
                    FROM {from_table}
                    WHERE {start} IS NOT NULL AND {end} IS NOT NULL),
        f AS (SELECT k, s, e,
                     CASE WHEN max(e) OVER (PARTITION BY k
                              ORDER BY s, e ROWS BETWEEN UNBOUNDED
                              PRECEDING AND 1 PRECEDING) IS NULL
                            OR s > max(e) OVER (PARTITION BY k
                              ORDER BY s, e ROWS BETWEEN UNBOUNDED
                              PRECEDING AND 1 PRECEDING)
                          THEN 1 ELSE 0 END AS new_i
              FROM iv),
        isl AS (SELECT k, s, e,
                       sum(new_i) OVER (PARTITION BY k ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS isl_id
                FROM f),
        g AS (SELECT k, isl_id, min(s) AS i_s, max(e) AS i_e
              FROM isl GROUP BY k, isl_id)
        SELECT k AS {key}, count(*) AS n_islands,
               CAST(sum(i_e - i_s) AS BIGINT) AS covered,
               CAST(max(i_e - i_s) AS BIGINT) AS longest
        FROM g GROUP BY k
    """
