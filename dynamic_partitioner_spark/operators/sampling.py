"""Deterministic sampling for training-data pipelines (north-star
extension surface — the reference has no sampling; SURVEY.md §2.9).

Everything here is **hash-based, not RNG-based**: the decision for a row
depends only on (salt, key), so

* re-runs — and the driver's oracle re-run — produce identical samples,
* samples are *stable under data growth* (a doc keeps its split
  assignment when the corpus doubles — the property that matters for
  train/val/test hygiene; ``df.sample()`` re-draws on every change),
* no coordination: every executor evaluates the same pure expression,
  zero shuffles for ``hash_sample``/``split_assign``.

The hash unit is the first 15 hex chars (60 bits) of
``md5(salt || key)`` scaled to [0, 1) — md5 is the one hash both Spark
and DuckDB expose, and 60 bits stays inside BIGINT in both engines
(Spark ``conv(_, 16, 10)``, DuckDB ``CAST('0x' || _ AS BIGINT)``), so
every sampling op ships with an exact SQL oracle twin — except
:func:`negative_pairs`, whose shard assignment uses ``xxhash64``
(absent in DuckDB) and is verified property-based instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..functions.checkpoint import checkpoint_df

#: 2^60 — denominator for the 60-bit hash → [0, 1) unit interval
_DENOM = float(1 << 60)


def _sql_lit(v) -> str:
    """Render a python value as a quoted SQL string literal with
    quote-escaping — EVERY data-derived string spliced into a twin
    goes through this (r15 review: the r14 salt-escaping fix covered
    hash_unit_sql only; split names, stratum keys, source names and
    importance targets still rendered raw, so a value like
    \"o'reilly.com\" broke the rendered oracle while F.lit hashed it
    fine).  Rendering is unchanged for quote-free values."""
    return "'" + str(v).replace("'", "''") + "'"


def _hash60(key: Column, salt: str) -> Column:
    """The 60-bit md5 BIGINT behind every draw — single authority
    (r15 review: kfold_assign carried a verbatim copy, which is how
    the r14 salt fix missed the inlined renders)."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), key.cast("string"))),
        1, 15), 16, 10).cast("bigint")


def _hash60_sql(str_expr: str, salt: str) -> str:
    """DuckDB twin of :func:`_hash60` over an already-VARCHAR
    expression; the salt is escaped into the literal (r14 review)."""
    esc = salt.replace("'", "''")
    return (f"CAST('0x' || substr(md5('{esc}' || {str_expr}), 1, 15) "
            f"AS BIGINT)")


def hash_unit(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) draw per key.

    Use integer or string keys: the key is stringified (``CAST(k AS
    VARCHAR)`` in the twin) and float formatting differs across engines.

    Boundary note (r13 review): hash values in ``[2^60 - 64, 2^60)``
    round UP in the int64→double cast, so the draw can be exactly
    1.0 — probability ~6e-17 per key, identical in BOTH engines (the
    twin does the same cast), so engine parity is unaffected; a
    consumer doing ``floor(u * n)`` arithmetic should tolerate the
    ``n`` edge or clamp, as ``weighted_sample`` clamps its own u=0
    edge.
    """
    return _hash60(key, salt) / F.lit(_DENOM)


def hash_unit_sql(key: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_unit` — identical 60-bit value and
    identical int64→double rounding, so comparisons agree exactly."""
    # || not concat(): DuckDB concat() IGNORES null arguments while
    # Spark's concat null-propagates — the || operator propagates, so a
    # NULL key draws NULL in both engines (and is dropped by every
    # sampling filter identically).  The salt is escaped into the SQL
    # string literal (r14 review: a rotated secret salt containing a
    # quote broke the rendered oracle while the F.lit twin hashed it
    # fine); rendering is unchanged for quote-free salts.
    return (f"({_hash60_sql(f'CAST({key} AS VARCHAR)', salt)} "
            f"/ 1152921504606846976.0)")


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash.

    Scale shape: a pure filter — predicate-pushdown-friendly, no
    shuffle, no RNG state, trivially repartition-stable.  Different
    ``salt`` values give independent samples of the same corpus.
    """
    return df.where(hash_unit(F.col(key_col), salt) < fraction)


def _validate_split_weights(weights: dict[str, float]) -> None:
    """Shared by the Column and SQL splitters: a NEGATIVE weight can
    pass the sum check while making its split unreachable (the
    cumulative thresholds go non-monotone and an earlier branch
    shadows it) — r13 review."""
    bad = {k: v for k, v in weights.items() if v <= 0}
    if bad:
        raise ValueError(f"split weights must be > 0, got {bad}")


def split_assign(df: DataFrame, key_col: str,
                 weights: dict[str, float] | None = None,
                 salt: str = "split") -> DataFrame:
    """Add a ``split`` column assigning each key to one named split.

    ``weights`` maps split name → fraction (must sum to ~1; default the
    classic 0.8/0.1/0.1 train/val/test).  Assignment is by cumulative
    thresholds over the key hash, so it is per-key stable: a document
    never migrates between splits when other data changes — the
    train/test-leak guarantee ``randomSplit`` cannot give.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    _validate_split_weights(weights)
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_unit(F.col(key_col), salt)
    # NULL keys draw NULL and get split NULL — explicitly unassigned,
    # never silently folded into the last-named split (which would
    # contaminate e.g. "test" with every null-id row)
    expr: Column = F.when(u.isNull(), F.lit(None).cast("string"))
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        expr = expr.when(u < acc, F.lit(name))
    return df.withColumn("split", expr.otherwise(F.lit(names[-1])))


def split_assign_sql(key: str, weights: dict[str, float] | None = None,
                     salt: str = "split") -> str:
    """DuckDB CASE twin of :func:`split_assign`'s ``split`` column."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    _validate_split_weights(weights)
    u = hash_unit_sql(key, salt)
    parts = [f"WHEN ({u}) IS NULL THEN NULL"]
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        parts.append(f"WHEN {u} < {acc!r} THEN {_sql_lit(name)}")
    return ("CASE " + " ".join(parts)
            + f" ELSE {_sql_lit(names[-1])} END")


def cap_per_group(df: DataFrame, group_col: str, key_col: str,
                  n: int, salt: str = "cap") -> DataFrame:
    """Keep at most ``n`` rows per group, chosen deterministically by
    key hash (e.g. "at most N documents per domain" — the standard
    source-balancing step before corpus mixing).

    One hash shuffle on the group key; the ``row_number() <= n`` filter
    is rank-limit-pushed by Spark (``WindowGroupLimit``), so each
    map task pre-prunes to its local top-n before the exchange — a hot
    group ships n rows per mapper, not its full membership.
    """
    u = hash_unit(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(key_col))
    # NULL keys draw NULL and sort NULLS FIRST in Spark / NULLS LAST
    # in DuckDB: unfiltered they crowd the cap nondeterministically on
    # one engine and not the other (r13 review; topk_hash_sample has
    # always filtered for the same reason)
    return (df.where(F.col(key_col).isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= n)
            .drop("_rn"))


def cap_per_group_sql(table_cols: str, group: str, key: str, n: int,
                      salt: str = "cap", from_table: str = "documents") -> str:
    """DuckDB QUALIFY twin of :func:`cap_per_group`."""
    u = hash_unit_sql(key, salt)
    return (f"SELECT {table_cols} FROM {from_table} "
            f"WHERE {key} IS NOT NULL "
            f"QUALIFY row_number() OVER (PARTITION BY {group} "
            f"ORDER BY {u} ASC, {key}) <= {n}")


def stratified_sample(df: DataFrame, stratum_col: str, key_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      salt: str = "strat") -> DataFrame:
    """Per-stratum hash sampling: each stratum keeps its own fraction
    (e.g. downsample boilerplate-heavy sources harder than curated
    ones).  Strata absent from ``fractions`` keep ``default_fraction``.

    Same scale shape as :func:`hash_sample`: a pure filter against a
    tiny inlined CASE lookup — no shuffle, no RNG state, no join; the
    fraction map lives in the plan, not in a table.  Deterministic in
    (key, salt), so re-runs and retries keep identical rows.
    """
    frac = F.lit(float(default_fraction))
    for stratum, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == stratum,
                      F.lit(float(f))).otherwise(frac)
    return df.where(hash_unit(F.col(key_col), salt) < frac)


def stratified_sample_sql(table_cols: str, stratum: str, key: str,
                          fractions: dict[str, float],
                          default_fraction: float = 0.0,
                          salt: str = "strat",
                          from_table: str = "documents") -> str:
    """DuckDB twin of :func:`stratified_sample` (identical hash draw
    and CASE lookup)."""
    u = hash_unit_sql(key, salt)
    case = "CASE"
    for s, f in sorted(fractions.items()):
        case += f" WHEN {stratum} = {_sql_lit(s)} THEN {float(f)!r}"
    case += f" ELSE {float(default_fraction)!r} END"
    return (f"SELECT {table_cols} FROM {from_table} "
            f"WHERE ({u}) < ({case})")


def mix_by_weights(df: DataFrame, source_col: str, key_col: str,
                   weights: dict[str, float], total_rows: int,
                   salt: str = "mix") -> DataFrame:
    """Deterministic weighted corpus mixture: sample each source at
    ``rate_s = min(1, weight_s·total_rows / n_s)`` so the output is a
    ~``total_rows``-row mixture with the requested source proportions,
    **independent of how large each source corpus is** — the dataset-
    mixing step of every pre-training pipeline (e.g. re-weighting web
    vs. books vs. code), reproducible because membership is a pure
    function of (salt, key).

    Sources not named in ``weights`` are dropped.  A source too small
    for its quota is taken whole (rate caps at 1 — hash sampling cannot
    upsample; repeat/epoch logic belongs downstream).  The per-source
    counts are one bounded driver-side aggregate (|sources| rows); the
    mixture itself is a pure filter, no extra shuffle.
    """
    counts = {r[0]: r[1]
              for r in df.groupBy(source_col).count().collect()}
    rate: Column | None = None
    for s, w in weights.items():
        n = counts.get(s)
        if not n:
            continue
        # same op order as the SQL twin: w * total / n, then cap
        r = min(1.0, float(w) * float(total_rows) / float(n))
        rate = (F.when(F.col(source_col) == s, F.lit(r)) if rate is None
                else rate.when(F.col(source_col) == s, F.lit(r)))
    if rate is None:
        raise ValueError("no weighted source present in the data")
    return df.where(hash_unit(F.col(key_col), salt) < rate.otherwise(F.lit(0.0)))


def mix_by_weights_sql(table_cols: str, source: str, key: str,
                       weights: dict[str, float], total_rows: int,
                       salt: str = "mix",
                       from_table: str = "documents") -> str:
    """DuckDB twin of :func:`mix_by_weights` — recomputes the per-source
    counts in a CTE and applies the identical rate formula, so the two
    engines agree bit-for-bit on every membership decision."""
    u = hash_unit_sql(key, salt)
    w_case = ("CASE " + " ".join(
        f"WHEN {source} = {_sql_lit(s)} THEN {w!r}"
        for s, w in weights.items())
        + " ELSE NULL END")
    in_list = ", ".join(_sql_lit(s) for s in weights)
    # the IN filter is load-bearing: DuckDB's least() IGNORES NULLs
    # (least(1.0, NULL) = 1.0), so an unweighted source would otherwise
    # pass at rate 1 instead of being dropped
    return (
        f"WITH _n AS (SELECT {source}, count(*) AS n FROM {from_table} "
        f"GROUP BY {source}) "
        f"SELECT {table_cols} FROM {from_table} t JOIN _n USING ({source}) "
        f"WHERE {source} IN ({in_list}) "
        f"AND {u} < least(1.0, ({w_case}) * {float(total_rows)!r} / n)")


def temperature_mixture(df: DataFrame, source_col: str, key_col: str,
                        total_rows: int,
                        salt: str = "temp") -> DataFrame:
    """Temperature-scaled source resampling at α = ½ (the standard
    multilingual/UniMax-style rebalancing: expected take from source s
    ∝ √n_s, flattening the head without equalizing), deterministic and
    oracle-exact.

    Weights use the INTEGER-quantized √n — ``floor(sqrt(n))`` with
    IEEE sqrt, bit-identical in Python and DuckDB — so the cross-source
    normalization ``S = Σ_s ⌊√n_s⌋`` is an exact integer sum
    (order-free, unlike a float Σ√n whose value depends on summation
    order).  Each source's keep rate is then ONE double division of two
    exact BIGINT products, ``min(1, (total·w_s) / (S·n_s))``, identical
    in both engines; membership is the md5 unit draw.  Same
    bounded-collect shape as :func:`mix_by_weights` (|sources| rows);
    the sample itself is a pure filter.  Rates cap at 1 — hash
    sampling cannot upsample; epoch/repeat logic belongs downstream.
    """
    import math

    # NULL-source rows are excluded from the NORMALIZATION, not just
    # the draw: they can never be sampled (NULL equality in the WHEN
    # chain; JOIN USING in the twin), so counting them inflated S and
    # silently shrank every real source's quota — the output fell
    # short of total_rows with no diagnostic (r15 review; the twin
    # filters its _n CTE identically)
    counts = {r[0]: int(r[1])
              for r in df.where(F.col(source_col).isNotNull())
              .groupBy(source_col).count().collect()}
    if not counts:
        raise ValueError("empty input: no sources to sample")
    w = {s: int(math.floor(math.sqrt(float(n)))) for s, n in counts.items()}
    S = sum(w.values())
    rate: Column | None = None
    for s, n in counts.items():
        # float() each operand FIRST: Python's int/int is the
        # correctly-rounded true ratio, which can differ in the last
        # ulp from the SQL twin's double/double once a product passes
        # 2^53 — double-ize both sides identically
        r = min(1.0, float(total_rows * w[s]) / float(S * n))
        rate = (F.when(F.col(source_col) == s, F.lit(r)) if rate is None
                else rate.when(F.col(source_col) == s, F.lit(r)))
    return df.where(hash_unit(F.col(key_col), salt)
                    < rate.otherwise(F.lit(0.0)))


def temperature_mixture_sql(table_cols: str, source: str, key: str,
                            total_rows: int, salt: str = "temp",
                            from_table: str = "documents") -> str:
    """DuckDB twin of :func:`temperature_mixture` — recomputes counts,
    integer-√ weights, and the exact-integer normalization in SQL."""
    u = hash_unit_sql(key, salt)
    return (
        f"WITH _n AS (SELECT {source}, count(*) AS n FROM {from_table} "
        f"WHERE {source} IS NOT NULL "
        f"GROUP BY {source}), "
        f"_w AS (SELECT {source}, n, "
        f"CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM _n), "
        f"_s AS (SELECT sum(w) AS s_tot FROM _w) "
        f"SELECT {table_cols} FROM {from_table} t "
        f"JOIN _w USING ({source}) CROSS JOIN _s "
        f"WHERE {u} < least(1.0, "
        f"CAST({int(total_rows)} * w AS DOUBLE) / CAST(s_tot * n AS DOUBLE))")


def topk_hash_sample(df: DataFrame, key_col: str, k: int,
                     salt: str = "") -> DataFrame:
    """EXACT-size deterministic sample: the ``k`` rows whose md5 unit
    draw is smallest.  ``hash_sample`` gives an approximate fraction
    (binomial scatter around n·p); this gives exactly ``k`` rows — the
    "give me a 10k-row sample of the 100 TB table" contract.

    Plans as TakeOrderedAndProject: each partition keeps its local
    top-k, the driver merges P·k candidates — no global sort, no full
    shuffle.  Deterministic for distinct keys (the 60-bit draw makes
    hash ties practically impossible; a tie would make the boundary
    row engine-dependent)."""
    if k <= 0:
        raise ValueError("k must be positive")
    # NULL keys draw NULL, and Spark's ASC sort is NULLS FIRST — left
    # unfiltered they would preferentially (and nondeterministically)
    # fill the sample
    # key tie-break: DUPLICATE key values share an identical 60-bit
    # draw, so a bare orderBy(_u) made the k-boundary row arbitrary
    # when equal-key rows straddled it (r13 review)
    return (df.where(F.col(key_col).isNotNull())
            .withColumn("_u", hash_unit(F.col(key_col), salt))
            .orderBy("_u", key_col)
            .limit(k)
            .drop("_u"))


def epoch_shuffle(df: DataFrame, key_col: str, n_shards: int = 8,
                  epoch: int = 0) -> DataFrame:
    """Deterministic per-epoch global shuffle for training exports:
    every row gets a fresh uniform draw salted by the epoch number,
    a balanced-in-expectation shard ``floor(u·n_shards)``, and its
    read position within the shard — so each epoch reads the corpus
    in a different but perfectly reproducible order, with no state
    carried between epochs (re-deriving the permutation is one map
    pass plus the per-shard rank).

    Scale shape: the only shuffle is the per-shard window sort; for a
    file-layout export at 100 TB skip the rank column and
    ``repartitionByRange(u).sortWithinPartitions(u)`` through the
    partitioned sink instead — same ordering contract, no global sort.

    ``key_col`` is the permutation identity and must be UNIQUE per row
    (duplicate keys share a draw, making their relative order
    arbitrary); NULL keys are excluded (they would draw a NULL shard).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    u = hash_unit(F.col(key_col), f"epoch{epoch}")
    # least(): hash_unit documents a ~6e-17/key u == 1.0 edge (the
    # int64→double round-up) — unclamped, floor(1.0·n) emits shard ==
    # n_shards, OUTSIDE the documented [0, n) range, and a consumer
    # reading shards 0..n-1 silently drops the row (r15 review; the
    # SQL twin clamps identically)
    out = df.where(F.col(key_col).isNotNull()) \
        .withColumn("_u", u).withColumn(
        "shard", F.least(F.floor(F.col("_u") * n_shards),
                         F.lit(n_shards - 1)).cast("long"))
    w = Window.partitionBy("shard").orderBy("_u", key_col)
    return (out.withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_u"))


def group_split(df: DataFrame, group_col: str,
                weights: dict[str, float] | None = None,
                salt: str = "gsplit") -> DataFrame:
    """Leakage-safe train/val/test assignment at the GROUP level: every
    row of a group (a user's events, a domain's documents, an author's
    posts) lands in the SAME split, because the hash draw is on the
    group key, not the row key.  Row-level splitting (``split_assign``
    on the row id) silently leaks near-duplicate rows of one entity
    across the train/test boundary — the classic contamination bug in
    behavioral and per-author corpora.

    Pure narrow projection: the split is a deterministic function of
    the group column already on the row, so there is NO shuffle and no
    group-table join — the leakage guarantee costs nothing at any
    scale.
    """
    return split_assign(df, group_col, weights=weights, salt=salt)


def balance_classes(df: DataFrame, label_col: str, key_col: str,
                    salt: str = "bal") -> DataFrame:
    """Class-balanced downsampling: every label keeps exactly
    ``min(class count)`` rows, chosen by the deterministic md5 unit
    draw (ties broken on the key) — the imbalanced-training fix that
    never resamples differently on re-runs.

    One shuffle on the label (the per-label rank window); the
    per-class counts reduce to a single broadcast scalar (the min), so
    no per-class driver state.  ``WindowGroupLimit`` cannot prune here
    (the limit is data-dependent), so the rank runs over full classes —
    at extreme imbalance pre-filter the majority class with
    ``hash_sample`` first and let the exact rank finish the job.
    """
    # NULL keys draw NULL and sort NULLS FIRST in Spark's ASC window:
    # they would preferentially AND nondeterministically fill each
    # class quota (all tie on (NULL, NULL)), contradicting the
    # never-resamples-differently contract (r13 review)
    base = df.where(F.col(label_col).isNotNull()
                    & F.col(key_col).isNotNull())
    counts = base.groupBy(label_col).agg(F.count(F.lit(1)).alias("_n"))
    target = counts.agg(F.min("_n").alias("_target"))
    u = hash_unit(F.col(key_col), salt)
    w = Window.partitionBy(label_col).orderBy(u.asc(), F.col(key_col).asc())
    ranked = base.withColumn("_rn", F.row_number().over(w))
    return (ranked.crossJoin(F.broadcast(target))
            .where(F.col("_rn") <= F.col("_target"))
            .drop("_rn", "_target"))


#: cumulative Poisson(1) pmf thresholds: P(X <= k) for k = 0..8 —
#: fixed constants shared verbatim by the SQL twin.  The inverse-CDF
#: truncates at weight 9 (the ELSE branch): P(X >= 9) ≈ 1.1e-6 of rows
#: draw 9 instead of their true 9+ weight — a documented, deliberate
#: cap (deeper tails change nothing at the 4-decimal output rounding).
_POISSON1_CDF = [0.36787944117144233, 0.7357588823428847,
                 0.9196986029286058, 0.9810118431238463,
                 0.9963401531726563, 0.9994058151824183,
                 0.999916758850712, 0.9999897508033253,
                 0.999998874797402]


def poisson_bootstrap(df: DataFrame, key_col: str, value_col: str,
                      n_replicates: int = 10,
                      salt: str = "boot") -> DataFrame:
    """Poisson bootstrap over a metric column: ``n_replicates``
    resampled means with effective sample sizes — the resampling
    scheme that works at any scale because each row draws its own
    independent Poisson(1) weight (no global sample-with-replacement
    pass; Chamandy et al., Google 2012, "Estimating uncertainty for
    massive data streams").

    Weights are deterministic: replicate ``b``'s weight for a row is
    the Poisson(1) inverse-CDF of the md5 unit draw on
    ``key#b`` — reproducible across runs, partitionings, and engines.
    Values quantize to integer micro-units so each replicate's
    weighted sum is exact in any order; only the final mean divides.
    One ``n_replicates``-way explode + one hash aggregate.
    """
    if n_replicates < 1:
        raise ValueError("n_replicates must be >= 1")
    # NULL keys draw NULL, fail every WHEN threshold, and fell through
    # to the otherwise() TAIL CAP — weight 9, the maximum, for exactly
    # the rows every other sampler drops; NULL values inflated n_eff
    # while adding nothing to the weighted sum (r13 review)
    df = df.where(F.col(key_col).isNotNull()
                  & F.col(value_col).isNotNull())
    vd = F.col(value_col).cast("double") * 1e6 + F.lit(0.5)
    # loud overflow guard (r15 review): past |value| ≈ 9.2e12 the
    # micro-unit quantization exceeds 2^63 — Spark's double→long cast
    # silently SATURATES into a plausible-looking wrong boot_mean
    # while the DuckDB twin's CAST raises; raise here too (NaN values
    # also land in the raise branch — a NaN metric must not enter the
    # replicate sums silently)
    v_ok = F.assert_true(
        F.coalesce(F.abs(vd) < F.lit(9.2e18), F.lit(False)),
        F.concat(F.lit("poisson_bootstrap: value "),
                 F.col(value_col).cast("string"),
                 F.lit(" overflows the 1e-6 micro-unit quantization "
                       "(|value| must stay below ~9.2e12) — rescale")))
    reps = df.select(
        F.col(key_col).alias("_k"),
        F.coalesce(v_ok.cast("long"), F.floor(vd).cast("long"))
        .alias("_v"),
        F.explode(F.sequence(F.lit(1), F.lit(n_replicates)))
        .alias("replicate"))
    u = hash_unit(F.concat(F.col("_k").cast("string"), F.lit("#"),
                           F.col("replicate").cast("string")), salt)
    w: Column = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    from ..functions.vectors import round4
    return (reps.withColumn("_w", w)
            .groupBy("replicate")
            .agg(F.sum(F.col("_w") * F.col("_v")).alias("_ws"),
                 F.sum("_w").alias("n_eff"))
            .select("replicate", "n_eff",
                    # n_eff=0 (every weight drew 0 — likely only on
                    # tiny inputs): 0/0 is NaN and floor(NaN) silently
                    # fabricates 0.0 in Spark while DuckDB NaN-casts
                    # differently — NULL mean on both engines instead
                    F.when(F.col("n_eff") > 0,
                           round4((F.col("_ws").cast("double") / 1e6)
                                  / F.col("n_eff")))
                    .alias("boot_mean")))


def poisson_bootstrap_sql(key: str, value: str, n_replicates: int = 10,
                          salt: str = "boot",
                          from_table: str = "events") -> str:
    """DuckDB twin of :func:`poisson_bootstrap` (identical thresholds,
    identical md5 unit draw)."""
    # hash_unit_sql would double-wrap the concatenated key in CAST(...
    # AS VARCHAR); compose the string expression and share the
    # escaped renderer (r15 review: this inline repeated the raw salt
    # the r14 fix escaped in hash_unit_sql)
    expr = (f"CAST({key} AS VARCHAR) "
            f"|| '#' || CAST(replicate AS VARCHAR)")
    u = f"({_hash60_sql(expr, salt)} / 1152921504606846976.0)"
    cases = " ".join(
        f"WHEN {u} < {c!r} THEN {k}"
        for k, c in enumerate(_POISSON1_CDF))
    return f"""
        WITH reps AS (
            SELECT {key},
                   CAST(floor(CAST({value} AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS v,
                   unnest(range(1, {n_replicates} + 1)) AS replicate
            FROM {from_table}
            WHERE {key} IS NOT NULL AND {value} IS NOT NULL),
        wtd AS (SELECT replicate, v,
                       CASE {cases} ELSE {len(_POISSON1_CDF)} END AS w
                FROM reps)
        SELECT replicate, CAST(sum(w) AS BIGINT) AS n_eff,
               CASE WHEN sum(w) > 0 THEN
                   floor((CAST(sum(w * v) AS DOUBLE) / 1000000)
                         / CAST(sum(w) AS BIGINT) * 10000 + 0.5) / 10000
               END AS boot_mean
        FROM wtd GROUP BY replicate
    """


def weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                    k: int, salt: str = "") -> DataFrame:
    """Exact-size weighted sample WITHOUT replacement (Efraimidis &
    Spirakis A-ES, the exponential-race form): each row draws
    ``u = hash_unit(key)`` and races with key ``-ln(u) / w``; the
    ``k`` smallest race keys win, so inclusion odds are proportional
    to weight — the corpus-reweighting primitive ("sample 10k docs
    proportional to quality score") a training pipeline runs at the
    very end.

    Scale shape: one map-side expression per row, then
    TakeOrderedAndProject (per-partition top-k, P·k driver merge) —
    no global sort, no RNG state, repartition-stable.

    Cross-engine determinism: ``u`` is the md5 60-bit unit draw (bit-
    identical in the SQL twin) but ``ln`` is libm — two engines may
    differ in the last ulp.  The race key is therefore quantized to
    1e-9 (floor half-up), which converts near-collisions into
    deterministic ties (broken on the key column) whenever both
    engines land in the same 1e-9 cell.  Residual risk: a race value
    within ~1 ulp of a cell EDGE can still floor into different cells
    and flip the boundary row of the sample — per-row probability
    ~2e-7 (ulp/cell ratio at race≈1), so a corpus-scale run should
    treat the last admitted row as engine-dependent; an exact-integer
    variant would need a fixed-point ln, which libm does not offer.  NULL keys and non-positive or NaN weights are
    excluded by filter — NaN in particular passes ``> 0`` and then
    races as ``floor(NaN)``, which Spark's cast makes 0 (always wins)
    while DuckDB keeps NaN (always loses): one stray NaN quality
    score would silently bias the Spark sample and break parity.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    u = hash_unit(F.col(key_col), salt)
    # u = 0 has probability 2^-60 but would make ln() blow up — clamp
    # identically in both engines
    u = F.greatest(u, F.lit(1e-18))
    w = F.col(weight_col).cast("double")
    race = -F.log(u) / w
    scaled = race * 1e9 + F.lit(0.5)
    # loud overflow guard (r15 review): below w ≈ 5e-9 the scaled race
    # exceeds 2^63 and Spark's floor→LONG SATURATES (every such row
    # collapses to one race_key, ordered by key instead of by weight)
    # while the SQL twin's floor stays DOUBLE — a silent cross-engine
    # membership divergence.  Raise instead; the condition tolerates
    # NaN/NULL rows the where() below drops (coalesce-over-assert, so
    # optimizer placement cannot surprise it — the quantize rule).
    ok = F.assert_true(
        F.coalesce(F.isnan(scaled) | (scaled < F.lit(9.2e18)),
                   F.lit(True)),
        F.concat(F.lit("weighted_sample: weight "), w.cast("string"),
                 F.lit(" below ~5e-9 overflows the 1e-9 race "
                       "quantization — rescale weights")))
    q = F.coalesce(ok.cast("double"),
                   F.floor(scaled).cast("double")) / 1e9
    return (df.where(F.col(key_col).isNotNull()
                     & (w > 0) & ~F.isnan(w))
            .withColumn("race_key", q)
            .orderBy("race_key", key_col)
            .limit(k))


def weighted_sample_sql(table_cols: str, table: str, key: str,
                        weight: str, k: int, salt: str = "") -> str:
    """DuckDB twin of :func:`weighted_sample` — same md5 draw, same
    clamp, same 1e-9 quantization, same tie-break."""
    u = f"greatest({hash_unit_sql(key, salt)}, 1e-18)"
    return f"""
        SELECT {table_cols},
               floor(-ln({u}) / CAST({weight} AS DOUBLE) * 1e9 + 0.5)
                   / 1e9 AS race_key
        FROM {table}
        WHERE {key} IS NOT NULL AND CAST({weight} AS DOUBLE) > 0
          AND NOT isnan(CAST({weight} AS DOUBLE))
        ORDER BY race_key, {key}
        LIMIT {k}
    """


def negative_pairs(df: DataFrame, id_col: str, k: int = 4,
                   n_shards: int = 8, salt: str = "") -> DataFrame:
    """Deterministic corpus-level negative sampling for contrastive
    training: each id gets ``k`` pseudo-random partner ids, never
    itself, reproducible across runs and repartitioning.

    Scale shape: ids hash into ``n_shards`` shards and negatives are
    drawn WITHIN the shard — the rank window partitions by shard, so
    there is no global sort and every shard ranks in parallel (a
    corpus-wide dense rank would serialize into one task).  Each
    (id, j) draw picks an offset in [1, shard_size−1] from the md5
    unit draw, walks the shard ring ``(rank−1+offset) mod size + 1``,
    and equi-joins back on (shard, rank) — two shuffles on the shard
    key.  Single-member shards have no valid partner and are excluded
    (at any real corpus size a hash shard is never a singleton).

    Determinism note: the offset draw is the md5 unit hash (exact in
    any engine), but the SHARD assignment uses Spark's ``xxhash64``,
    which DuckDB does not implement — so no exact SQL oracle twin
    exists for this operator (the one exception to the module
    header's twin rule; r15 review corrected the former
    "cross-engine exact" claim, which covered only the offset).
    Verification is property-based (pytest pins: never-self, k
    partners per id, determinism across runs).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    base = (df.where(F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("_id"))
            .distinct()
            .withColumn("_shard", F.pmod(F.xxhash64(F.col("_id")),
                                         F.lit(n_shards))))
    w = Window.partitionBy("_shard").orderBy("_id")
    ranked = base.select(
        "_id", "_shard", F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("_shard")).alias("_n"))
    drawn = (ranked.where(F.col("_n") > 1)
             .select("_id", "_shard", "_rn", "_n",
                     F.explode(F.sequence(F.lit(1), F.lit(k)))
                     .alias("pair_idx")))
    u = hash_unit(F.concat(F.col("_id").cast("string"), F.lit("#"),
                           F.col("pair_idx").cast("string")), salt)
    # least(): at the documented u == 1.0 hash edge, floor(1·(n−1))+1
    # = n wraps the ring back to the row's own rank — neg_id == id,
    # violating the never-itself contract (r15 review); clamp to the
    # last valid offset n−2 (+1 below); _n ≥ 2 by the singleton filter
    off = (F.least(F.floor(u * (F.col("_n") - 1)),
                   F.col("_n") - 2) + 1).cast("long")
    drawn = drawn.withColumn(
        "_neg_rn", (F.col("_rn") - 1 + off) % F.col("_n") + 1)
    neg = ranked.select(F.col("_shard"), F.col("_rn").alias("_neg_rn"),
                        F.col("_id").alias("neg_id"))
    return (drawn.join(neg, ["_shard", "_neg_rn"])
            .select(F.col("_id").alias(id_col), "pair_idx", "neg_id"))


def allocate_budget(df: DataFrame, group_cols: list[str],
                    weight_col: str, budget: int) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer token
    budget across corpus groups proportional to an integer weight —
    the "mix 1M tokens across (lang, source) proportional to size"
    step that turns corpus statistics into a training-data recipe.
    Every group gets ``floor(budget·w/W)``; the leftover seats go to
    the largest fractional remainders (``budget·w mod W``), ties
    broken on the group key, so ``Σ alloc == budget`` EXACTLY and the
    whole computation is integer arithmetic — bit-identical in any
    engine, no float shares to drift.

    Scale shape: one map-side-combined hash aggregate over the corpus
    (the only pass that touches data), then window ranking over the
    GROUP frame only — #groups rows (bounded: langs × sources), so the
    single-partition window is a non-issue at any corpus size.

    ``weight_col`` must be integral and non-negative; zero-weight
    groups get zero base and rank last-by-remainder (they can still
    win a remainder seat only after every positive remainder — with
    remainder 0 they tie at the bottom and take seats only when
    #groups exceeds the leftover, i.e. never ahead of real mass).
    Degenerate zero-total-mass input (every group weight 0) allocates
    0 everywhere — the one case where Σ alloc ≠ budget, by design
    (there is nothing to apportion over); the 128-bit product keeps
    ``budget·w`` exact far past BIGINT (see the inline note).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    g = (df.groupBy(*group_cols)
         .agg(F.sum(F.col(weight_col).cast("long")).alias("w")))
    # "tw" not "W": Spark resolves case-insensitively by default,
    # so a joined frame with both "w" and "W" is ambiguous
    tot = g.agg(F.sum("w").alias("tw"))
    b = F.lit(int(budget))
    j = g.join(F.broadcast(tot))
    # DECIMAL(38,0) product: budget·w overflows BIGINT once w exceeds
    # ~9.2e18/budget (≈9 TB of chars at budget=1e6 — well inside the
    # design scale); the 128-bit product with `div`/`%` is exact and
    # bit-identical to the oracle's HUGEINT arithmetic.  tw = 0 (no
    # mass anywhere) is the degenerate case: every alloc is 0 —
    # documented, never a divide-by-zero (ANSI Spark raises on div 0).
    bdec = f"CAST({int(budget)} AS DECIMAL(38,0))"
    j = j.select(
        *group_cols, "w", "tw",
        F.expr(f"CASE WHEN tw > 0 THEN CAST(({bdec} * w) div tw "
               f"AS BIGINT) ELSE 0 END").alias("base"),
        F.expr(f"CASE WHEN tw > 0 THEN CAST(({bdec} * w) % tw "
               f"AS BIGINT) ELSE 0 END").alias("rem"))
    # unpartitioned window over the STRATA relation only (one row per
    # group tuple, bounded by the strata universe, not the corpus) —
    # the single-partition WindowExec warning is accepted by design
    wnd = Window.orderBy(F.col("rem").desc(),
                         *[F.col(c) for c in group_cols])
    leftover = F.when(
        F.col("tw") > 0,
        b - F.sum("base").over(
            Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing))).otherwise(0)
    return (j.withColumn("_rk", F.row_number().over(wnd))
            .withColumn("_leftover", leftover)
            .select(*group_cols, "w",
                    (F.col("base")
                     + F.when(F.col("_rk") <= F.col("_leftover"), 1)
                     .otherwise(0)).cast("long").alias("alloc")))


def allocate_budget_sql(group_cols: list[str], weight: str, budget: int,
                        from_table: str) -> str:
    """DuckDB twin of :func:`allocate_budget` (same integer
    apportionment, same tie-break).  The apportionment CTE chain is
    restated in :func:`neyman_allocation_sql` — keep the two in sync
    (see the note there)."""
    gc = ", ".join(group_cols)
    order = ", ".join(group_cols)
    return f"""
        WITH g AS (
            SELECT {gc}, CAST(sum(CAST({weight} AS BIGINT)) AS BIGINT) AS w
            FROM {from_table} GROUP BY {gc}),
        t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM g),
        j AS (SELECT {gc}, w,
                     CASE WHEN tw > 0 THEN CAST(
                         (CAST({budget} AS HUGEINT) * w) // tw
                         AS BIGINT) ELSE 0 END AS base,
                     CASE WHEN tw > 0 THEN CAST(
                         (CAST({budget} AS HUGEINT) * w) % tw
                         AS BIGINT) ELSE 0 END AS rem,
                     tw
              FROM g, t),
        r AS (SELECT *,
                     row_number() OVER (ORDER BY rem DESC, {order}) AS rk,
                     CASE WHEN tw > 0
                          THEN {budget} - sum(base) OVER ()
                          ELSE 0 END AS leftover
              FROM j)
        SELECT {gc}, w,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc
        FROM r
    """


def neyman_allocation(df: DataFrame, stratum_col: str, key_col: str,
                      value_col: str, budget: int,
                      salt: str = "neyman") -> DataFrame:
    """Dispersion-proportional (Neyman-style) stratified sample:
    allocate an integer ``budget`` across strata proportional to
    ``N_h · dispersion_h`` (Neyman 1934 — sample more where the
    response varies more), then draw exactly that many rows per
    stratum by deterministic key hash.

    Dispersion is the INTERQUARTILE RANGE, not the textbook standard
    deviation: interpolated percentiles are bit-identical cross-engine
    (the ``query_percentiles`` parity, Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``) while a float stddev's summation order is not —
    and the IQR is the standard robust scale estimate anyway.  Every
    subsequent step is integer arithmetic:

    1. per-stratum ``N_h`` and ``iqr_micro = floor(IQR·1e6 + 0.5)``
       (rows with NULL ``value_col`` are excluded from stats AND draw);
    2. weight ``w_h = (N_h · iqr_micro) div 1e6`` — DECIMAL(38,0)
       product truncated back to whole units so it feeds the BIGINT
       Hamilton apportionment; constant strata (IQR 0) weigh 0 and
       win only leftover seats;
    3. ``alloc_h`` via :func:`allocate_budget` (largest remainder,
       Σ alloc == budget exactly);
    4. draw: rank rows inside each stratum by (md5 unit draw, key),
       keep rank ≤ alloc_h — over-allocated strata cap at ``N_h``.

    Returns one row per stratum: ``(stratum, n_rows, iqr, w, alloc,
    n_sampled, sampled_id_sum)`` — the id-sum is an exact BIGINT
    membership checksum an oracle recomputes independently, so
    ``key_col`` must be an INTEGRAL column (validated loudly — a
    string key silently cast to NULL and summed to a useless 0
    checksum while the SQL twin's sum(VARCHAR) hard-errored,
    r15 review).

    Scale shape: one map-side-combined corpus agg for the stats; the
    Hamilton window runs on the strata frame only; the draw is one
    window shuffle keyed on the stratum (cap_per_group's shape with a
    per-stratum limit broadcast in).
    """
    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   ShortType)

    from ..functions.vectors import round4

    sc, kc, vc = stratum_col, key_col, value_col
    key_dt = df.schema[kc].dataType
    if not isinstance(key_dt, (ByteType, ShortType, IntegerType,
                               LongType)):
        raise ValueError(
            f"neyman_allocation needs an integral key_col for the "
            f"sampled_id_sum checksum; got {key_dt.simpleString()} — "
            "hash or index string keys first")
    # key NOT NULL: the draw ranks by hash(key), and NULL draws sort
    # NULLS FIRST in Spark / NULLS LAST in DuckDB — opposite sample
    # memberships (r13 review).  NaN values excluded: one NaN makes
    # the stratum IQR NaN, which Spark's floor silently collapses to
    # weight 0 while DuckDB's CAST errors.
    base = df.where(F.col(vc).isNotNull()
                    & ~F.isnan(F.col(vc).cast("double"))
                    & F.col(kc).isNotNull())
    stats = (base.groupBy(sc)
             .agg(F.count(F.lit(1)).alias("n_rows"),
                  F.expr(f"percentile({vc}, 0.25)").alias("_p25"),
                  F.expr(f"percentile({vc}, 0.75)").alias("_p75"))
             .withColumn("iqr_micro",
                         F.floor((F.col("_p75") - F.col("_p25"))
                                 * F.lit(1_000_000.0) + F.lit(0.5))
                         .cast("long"))
             .withColumn("w", F.expr(
                 "CAST((CAST(n_rows AS DECIMAL(38,0)) * iqr_micro) "
                 "div 1000000 AS BIGINT)")))
    # both strata-sized frames feed TWO consumers each (stats → the
    # Hamilton pass + the output join; alloc → the draw limit + the
    # output join) — eager localCheckpoint materializes each tiny
    # relation once, so the corpus agg runs a single time and the
    # Hamilton 1-row-broadcast subtree doesn't replicate into every
    # downstream plan branch (the multi-consumer lesson from the
    # triangle census)
    stats = checkpoint_df(stats)
    alloc = checkpoint_df(allocate_budget(stats, [sc], "w", budget)
                          .select(sc, "alloc"))
    rank_w = Window.partitionBy(sc).orderBy(
        hash_unit(F.col(kc), salt).asc(), F.col(kc).asc())
    drawn = (base.select(sc, kc)
             .withColumn("_rn", F.row_number().over(rank_w))
             .join(F.broadcast(alloc), sc)
             .where(F.col("_rn") <= F.col("alloc"))
             .groupBy(sc)
             .agg(F.count(F.lit(1)).alias("n_sampled"),
                  F.sum(F.col(kc).cast("long")).alias("sampled_id_sum")))
    return (stats.join(alloc, sc).join(drawn, sc, "left")
            .select(sc, "n_rows",
                    round4(F.col("_p75") - F.col("_p25")).alias("iqr"),
                    "w", "alloc",
                    F.coalesce("n_sampled", F.lit(0)).cast("long")
                    .alias("n_sampled"),
                    F.coalesce("sampled_id_sum", F.lit(0)).cast("long")
                    .alias("sampled_id_sum")))


def neyman_allocation_sql(stratum: str, key: str, value: str, budget: int,
                          from_table: str, salt: str = "neyman") -> str:
    """DuckDB twin of :func:`neyman_allocation` — same percentile
    interpolation, same HUGEINT/DECIMAL(38,0) integer weights, same
    Hamilton tie-breaks, same md5 draw.

    The j/r/alloc CTE chain deliberately restates
    :func:`allocate_budget_sql`'s apportionment (that twin is a
    self-contained query, not a composable CTE block) — any change to
    the shared Hamilton arithmetic there (tie-break, HUGEINT product,
    degenerate tw=0) must be mirrored here, and vice versa."""
    u = hash_unit_sql("k", salt)
    return f"""
        WITH base AS (SELECT {stratum} AS s, {key} AS k, {value} AS v
                      FROM {from_table}
                      WHERE {value} IS NOT NULL
                        AND NOT isnan(CAST({value} AS DOUBLE))
                        AND {key} IS NOT NULL),
        stats AS (SELECT s, count(*) AS n_rows,
                         quantile_cont(v, 0.25) AS p25,
                         quantile_cont(v, 0.75) AS p75
                  FROM base GROUP BY s),
        wts AS (SELECT s, n_rows, p25, p75,
                       CAST((CAST(n_rows AS HUGEINT)
                             * CAST(floor((p75 - p25) * 1000000.0 + 0.5)
                                    AS BIGINT)) // 1000000
                            AS BIGINT) AS w
                FROM stats),
        t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM wts),
        j AS (SELECT s, n_rows, p25, p75, w, tw,
                     CASE WHEN tw > 0 THEN CAST(
                         (CAST({budget} AS HUGEINT) * w) // tw
                         AS BIGINT) ELSE 0 END AS base_a,
                     CASE WHEN tw > 0 THEN CAST(
                         (CAST({budget} AS HUGEINT) * w) % tw
                         AS BIGINT) ELSE 0 END AS rem
              FROM wts, t),
        r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, s) AS rk,
                     CASE WHEN tw > 0
                          THEN {budget} - sum(base_a) OVER ()
                          ELSE 0 END AS leftover
              FROM j),
        alloc AS (SELECT s, n_rows, p25, p75, w,
                         base_a + CASE WHEN rk <= leftover
                                       THEN 1 ELSE 0 END AS alloc
                  FROM r),
        ranked AS (SELECT s, k,
                          row_number() OVER (PARTITION BY s
                              ORDER BY {u}, k) AS rn
                   FROM base),
        drawn AS (SELECT ranked.s, count(*) AS n_sampled,
                         CAST(sum(k) AS BIGINT) AS sampled_id_sum
                  FROM ranked JOIN alloc USING (s)
                  WHERE rn <= alloc GROUP BY ranked.s)
        SELECT s AS {stratum}, n_rows,
               floor((p75 - p25) * 10000 + 0.5) / 10000 AS iqr,
               w, CAST(alloc AS BIGINT) AS alloc,
               coalesce(n_sampled, 0) AS n_sampled,
               coalesce(sampled_id_sum, 0) AS sampled_id_sum
        FROM alloc LEFT JOIN drawn USING (s)
    """


def importance_weights(df: DataFrame, stratum_col: str,
                       targets_permille: dict[str, int]) -> DataFrame:
    """Per-stratum importance reweighting factors: the multiplier that
    reshapes the corpus distribution into a target mixture
    (``weight_g = target_share_g / corpus_share_g``) — the sampling-
    free alternative to :func:`mix_by_weights` when downstream
    training consumes example weights instead of resampled data.

    Targets are integer per-mille shares (must sum to 1000) so the
    target side is exact; the weight is ONE double division of exact
    BIGINTs (``t_g·W / (1000·w_g)``) rounded to 4 dp — deterministic
    cross-engine.  Strata missing from ``targets_permille`` get weight
    0 (excluded), strata in the target but absent from the corpus are
    reported with NULL weight (unfillable mass — the caller must
    re-normalize or source more data; silently renormalizing here
    would hide a recipe violation).

    One hash aggregate over the corpus; the output is one row per
    stratum (bounded), broadcast-joinable back onto rows.
    """
    from ..functions.vectors import round4

    total = sum(targets_permille.values())
    if total != 1000:
        raise ValueError(f"target shares must sum to 1000‰, got {total}")
    g = (df.groupBy(stratum_col)
         .agg(F.count(F.lit(1)).alias("n_rows")))
    tgt = df.sparkSession.createDataFrame(
        sorted(targets_permille.items()),
        f"{stratum_col} string, t_pm long")
    W = g.agg(F.sum("n_rows").alias("n_total"))
    j = (g.join(tgt, stratum_col, "full_outer")
         .join(F.broadcast(W))
         .select(stratum_col,
                 F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
                 F.coalesce(F.col("t_pm"), F.lit(0)).alias("t_pm"),
                 "n_total"))
    w = F.when(F.col("n_rows") > 0,
               round4((F.col("t_pm") * F.col("n_total"))
                      / (F.lit(1000) * F.col("n_rows"))))
    return j.select(stratum_col, "n_rows", "t_pm",
                    w.alias("weight")).orderBy(stratum_col)


def importance_weights_sql(stratum: str, targets_permille: dict[str, int],
                           from_table: str) -> str:
    """DuckDB twin of :func:`importance_weights` (same integer targets,
    same single division, same round4)."""
    vals = ", ".join(f"({_sql_lit(k)}, {v})"
                     for k, v in sorted(targets_permille.items()))
    return f"""
        WITH g AS (SELECT {stratum} AS s, count(*) AS n_rows
                   FROM {from_table} GROUP BY {stratum}),
        tgt(s, t_pm) AS (VALUES {vals}),
        tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM g),
        j AS (SELECT coalesce(g.s, tgt.s) AS {stratum},
                     coalesce(n_rows, 0) AS n_rows,
                     coalesce(t_pm, 0) AS t_pm, n_total
              FROM g FULL OUTER JOIN tgt ON g.s = tgt.s, tot)
        SELECT {stratum}, n_rows, CAST(t_pm AS BIGINT) AS t_pm,
               CASE WHEN n_rows > 0 THEN
                   floor((t_pm * n_total)
                         / (1000.0 * n_rows) * 10000 + 0.5) / 10000
               END AS weight
        FROM j
    """


def kfold_assign(df: DataFrame, key_col: str, k: int,
                 salt: str = "fold") -> DataFrame:
    """Deterministic k-fold assignment for cross-validation: fold =
    60-bit md5 hash mod k on the key — per-key stable (a document
    keeps its fold as the corpus grows, the same leak-safety property
    as :func:`split_assign`), uniform, and exactly reproducible in
    the SQL twin.  Adds a ``fold`` column in [0, k); NULL keys get
    NULL fold (explicitly unassigned)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn(
        "fold", (_hash60(F.col(key_col), salt) % k).cast("long"))


def kfold_assign_sql(key: str, k: int, salt: str = "fold") -> str:
    """DuckDB twin of :func:`kfold_assign`'s ``fold`` column (the
    60-bit value is non-negative, so both engines' `%` agree)."""
    return f"({_hash60_sql(f'CAST({key} AS VARCHAR)', salt)} % {k})"
