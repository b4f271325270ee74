"""K-anonymity suppression over quasi-identifier columns.

Governance primitive for shipping analytics extracts: any combination
of quasi-identifier values shared by fewer than ``k`` rows is
suppressed (replaced by a redaction marker), so no released row's
quasi-identifier tuple isolates fewer than ``k`` individuals.  Public
technique (Sweeney, k-anonymity); suppression-only — generalization
hierarchies are a caller-side mapping applied before this operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def k_anonymize(df: DataFrame, quasi_cols: list[str], k: int,
                redacted: str = "*") -> DataFrame:
    """Suppress quasi-identifier tuples occurring fewer than ``k``
    times; adds ``group_size`` (the pre-suppression tuple count, a
    useful audit column — it never goes below ``k`` except on redacted
    rows).

    One window count over the quasi-identifier key — a single shuffle,
    no join; the redaction itself is a codegen CASE per column.  Quasi
    columns must be strings (redaction substitutes a marker string);
    cast or bucket numeric quasi-identifiers first, which is also what
    a generalization hierarchy does.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(*quasi_cols)
    if "group_size" in df.columns:
        raise ValueError(
            "input already has a 'group_size' column — rename it; "
            "k_anonymize adds its audit column under that name")
    out = df.withColumn("group_size", F.count(F.lit(1)).over(w))
    small = F.col("group_size") < k
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(small, F.lit(redacted)).otherwise(F.col(c)))
    return out


def l_diversify(df: DataFrame, quasi_cols: list[str], sensitive_col: str,
                l: int, redacted: str = "*") -> DataFrame:
    """l-diversity suppression: redact quasi-identifier tuples whose
    group contains fewer than ``l`` DISTINCT sensitive values.

    k-anonymity alone leaks when a large group is homogeneous in the
    sensitive attribute (everyone in the group shares the secret);
    l-diversity (Machanavajjhala et al., 2007) additionally requires
    in-group sensitive diversity.  Suppression-only, like
    :func:`k_anonymize`.

    Shape: one count-distinct aggregate on the quasi-identifier key,
    joined back (Catalyst broadcasts it while it is small; near-unique
    QI tuples — exactly the regime suppression targets — make it
    table-sized, where a forced broadcast would OOM, so the join
    strategy is left to the optimizer); redaction is a codegen CASE.
    Adds ``sens_diversity`` (pre-suppression distinct count, audit
    column).
    """
    if l < 1:
        raise ValueError("l must be >= 1")
    if "sens_diversity" in df.columns:
        raise ValueError(
            "input already has a 'sens_diversity' column — rename it; "
            "l_diversify adds its audit column under that name")
    stats = (df.groupBy(*quasi_cols)
             .agg(F.countDistinct(sensitive_col).alias("sens_diversity")))
    # null-safe equality so NULL quasi-identifier values join back to
    # their own group exactly as groupBy grouped them
    stats_a = stats.select(
        *[F.col(c).alias(f"_qi_{c}") for c in quasi_cols],
        "sens_diversity")
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_qi_{c}"))
        cond = eq if cond is None else cond & eq
    out = df.join(stats_a, cond)
    small = F.col("sens_diversity") < l
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(small, F.lit(redacted)).otherwise(F.col(c)))
    return out.select(*df.columns, "sens_diversity")


def _require_non_float_groups(df: DataFrame, group_cols: list[str]) -> None:
    """Reject floating-point group columns: Spark and DuckDB format
    doubles differently when cast to string, so the noise seed would
    diverge from the oracle — cast/round to a string or integer key
    first."""
    for c in group_cols:
        if df.schema[c].dataType.simpleString() in ("double", "float"):
            raise ValueError(
                f"group column {c!r} is floating-point: cast to a "
                "string or integer key first (string formatting of "
                "doubles diverges across engines)")


def _group_seed_key(group_cols: list[str]) -> Column:
    """Deterministic per-group seed string.  concat_ws SKIPS nulls,
    which would collapse distinct groups that differ only in which
    column is NULL onto one seed — encode NULL explicitly.  Every
    non-NULL value is prefixed with chr(29) and the NULL sentinel
    starts with chr(30), so NO value can spell the sentinel (r14
    review: an unprefixed value literally equal to the sentinel
    string drew the same noise as the NULL group)."""
    return F.concat_ws("\x1f", *[
        F.coalesce(F.concat(F.lit("\x1d"), F.col(c).cast("string")),
                   F.lit("\x1eNULL"))
        for c in group_cols])


def _group_seed_key_sql(group_cols: list[str]) -> str:
    """SQL twin of :func:`_group_seed_key`."""
    return ("concat_ws(chr(31), " +
            ", ".join(f"coalesce(chr(29) || CAST({c} AS VARCHAR), "
                      f"chr(30) || 'NULL')"
                      for c in group_cols) + ")")


#: floor for the Laplace inverse-CDF magnitude: hash_unit's draw can be
#: EXACTLY 0.0 or (documented, ~6e-17 per key) round to 1.0, where
#: ``ln(1 - 2|u - 0.5|) = ln(0)`` — NULL in Spark but a hard
#: OutOfRangeException in DuckDB (r14 review, verified both).  The
#: clamp caps |noise| at scale·ln(1e12) ≈ 27.6·scale — the inverse-CDF
#: tail a 1-in-1.8e12 draw legitimately produces.
_LAPLACE_MAG_FLOOR = 1e-12


def _laplace_noise(u: Column, scale: float) -> Column:
    """Inverse-CDF Laplace sample of the given scale from a unit draw
    — deterministic, so the release is reproducible and the oracle
    matches exactly (see the HONESTY NOTE on the public functions)."""
    centered = u - F.lit(0.5)
    mag = F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(centered),
                     F.lit(_LAPLACE_MAG_FLOOR))
    return F.lit(-float(scale)) * F.signum(centered) * F.log(mag)


def _laplace_noise_sql(u: str, scale: float) -> str:
    """SQL twin of :func:`_laplace_noise`."""
    return (f"({-float(scale)!r}) * sign(({u}) - 0.5) "
            f"* ln(greatest(1.0 - 2.0 * abs(({u}) - 0.5), "
            f"{_LAPLACE_MAG_FLOOR!r}))")


def dp_noisy_counts(df: DataFrame, group_cols: list[str], epsilon: float,
                    salt: str = "dp") -> DataFrame:
    """Laplace-mechanism noisy group counts (ε-DP shape, sensitivity 1)
    with SEEDED noise: ``u`` is the md5 unit draw on the group key, and
    ``noise = -(1/ε)·sign(u−½)·ln(1−2|u−½|)`` is the inverse-CDF
    Laplace sample — deterministic, so the released table is
    reproducible and the DuckDB oracle matches exactly.

    HONESTY NOTE: seeded noise is NOT differential privacy in the
    formal sense — an adversary who knows the salt can subtract the
    noise.  This operator provides the release *shape* (noisy counts,
    post-processing-safe rounding) for reproducible pipelines; a real
    release must draw fresh randomness per publication (rotate ``salt``
    from a secret source) and account the privacy budget.

    One hash-aggregate on the group key; the noise is a codegen
    expression over the aggregated (tiny) relation.
    """
    from ..functions.vectors import round4
    from .sampling import hash_unit

    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    _require_non_float_groups(df, group_cols)
    u = hash_unit(_group_seed_key(group_cols), salt)
    noise = _laplace_noise(u, 1.0 / epsilon)
    out = (df.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("true_count")))
    return out.select(
        *group_cols, "true_count",
        round4(F.col("true_count") + noise).alias("noisy_count"))


def dp_noisy_counts_sql(group_cols: list[str], epsilon: float,
                        salt: str = "dp",
                        from_table: str = "customer") -> str:
    """DuckDB twin of :func:`dp_noisy_counts` — including the Spark
    side's parameter validation (r14 review)."""
    from ..functions.vectors import ROUND4_SQL
    from .sampling import hash_unit_sql

    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    cols = ", ".join(group_cols)
    u = hash_unit_sql(_group_seed_key_sql(group_cols), salt)
    noise = _laplace_noise_sql(u, 1.0 / epsilon)
    return (
        f"WITH g AS (SELECT {cols}, count(*) AS true_count "
        f"FROM {from_table} GROUP BY {cols}) "
        f"SELECT {cols}, true_count, "
        + ROUND4_SQL.format(x=f"true_count + {noise}")
        + " AS noisy_count FROM g")


def t_closeness(df: DataFrame, quasi_cols: list[str],
                sensitive_col: str) -> DataFrame:
    """Per-equivalence-class t-closeness measurement (Li et al. 2007):
    the total-variation distance between each class's sensitive-value
    distribution and the global one — the release gate that catches
    what k-anonymity and l-diversity miss (a class can be large and
    diverse yet still skewed enough to leak).

    Exact integer arithmetic: with class counts ``c_i`` (class size
    ``n_c``) and global counts ``g_i`` (total ``n_g``),

        TVD = Σ|c_i·n_g − g_i·n_c| / (2·n_c·n_g)

    — the numerator is an order-free BIGINT sum over the sensitive
    domain, and the single double division at the end is identical in
    both engines (then round4).  Values absent from a class still
    contribute ``g_i·n_c`` (the join keeps the full sensitive domain
    per class), so a class missing a common value scores correctly.

    One scan feeds the class counts; the domain totals and global
    total are derived from THAT aggregate (tiny relations), so the
    whole plan is lazy — no driver-side count at build time.  Values
    absent from a class contribute in CLOSED FORM rather than via a
    materialized (class × sensitive-domain) grid (r14 review — the
    grid is quadratic for zero accuracy gain): each absent value i
    contributes exactly ``g_i·n_c``, and summing over the absent set
    gives ``n_c·(n_g − Σ_present g_i)`` — the same exact BIGINTs the
    grid summed, over only the PRESENT (class, value) cells.  NULL
    sensitive values are excluded from both distributions
    identically; a NULL QUASI value is a legitimate class of its own
    (the per-class joins are null-safe — a null-unsafe key would drop
    the class, code-review r6).  The BIGINT numerator bound
    (n_g < ~3e9) is asserted inside the plan; move the counts to
    DECIMAL(38,0) for larger corpora.
    """
    if not quasi_cols:
        raise ValueError("t_closeness needs at least one quasi column")
    from ..functions.vectors import round4
    base = (df.where(F.col(sensitive_col).isNotNull())
            .select(*[F.col(c) for c in quasi_cols],
                    F.col(sensitive_col).alias("_s")))
    cls = base.groupBy(*quasi_cols, "_s").agg(
        F.count(F.lit(1)).alias("_c"))
    cls_tot = cls.groupBy(*quasi_cols).agg(
        F.sum("_c").alias("_nc"))
    glob = cls.groupBy("_s").agg(F.sum("_c").alias("_g"))
    # 1-row global total with the overflow bound asserted in-plan
    # (same coalesce-over-assert_true trick as range_join_binned)
    ng_ok = F.assert_true(
        F.col("_ng") <= F.lit(3_000_000_000),
        F.lit("t_closeness integer numerator overflows BIGINT past "
              "~3e9 rows; cast the counts to DECIMAL(38,0)"))
    ng = (glob.agg(F.sum("_g").alias("_ng"))
          .select(F.coalesce(ng_ok.cast("long"), F.col("_ng"))
                  .alias("_ng")))
    # present cells only: |c_i·n_g − g_i·n_c| plus the running Σ g_i
    # this class has seen; every class has >= 1 present cell (classes
    # are derived from non-null-_s rows), so the inner joins keep all
    c_side = cls.alias("C")
    t_side = cls_tot.alias("T")
    cond = None
    for c in quasi_cols:
        eq = F.col(f"C.{c}").eqNullSafe(F.col(f"T.{c}"))
        cond = eq if cond is None else cond & eq
    present = (c_side.join(t_side, cond)
               .select(*[F.col(f"C.{c}") for c in quasi_cols],
                       F.col("T._nc").alias("_nc"),
                       F.col("C._s").alias("_s"),
                       F.col("C._c").alias("_c"))
               .join(F.broadcast(glob), "_s")
               .crossJoin(F.broadcast(ng)))
    num = (present.groupBy(*quasi_cols, "_nc", "_ng")
           .agg(F.sum(F.abs(F.col("_c") * F.col("_ng")
                            - F.col("_g") * F.col("_nc")))
                .alias("_pnum"),
                F.sum("_g").alias("_gp")))
    return num.select(
        *quasi_cols, F.col("_nc").alias("n_class"),
        round4((F.col("_pnum")
                + F.col("_nc") * (F.col("_ng") - F.col("_gp")))
               .cast("double")
               / (2.0 * F.col("_nc").cast("double")
                  * F.col("_ng").cast("double")))
        .alias("tvd"))


def dp_noisy_sums(df: DataFrame, group_cols: list[str], value_col: str,
                  clip: float, epsilon: float,
                  salt: str = "dpsum") -> DataFrame:
    """Laplace-mechanism noisy group SUMS (ε-DP release shape,
    sensitivity = ``clip``): each contribution is clipped to
    ``[0, clip]`` — the bounded-contribution step that makes the sum's
    sensitivity finite — then summed exactly in micro-units, and
    seeded Laplace noise of scale ``clip/ε`` is added per group.

    Same HONESTY NOTE as :func:`dp_noisy_counts`: the seeded noise
    makes the release reproducible and oracle-checkable, not formally
    private — rotate the salt from a secret source for a real release.
    Clip + exact integer sum keeps the pre-noise value bit-identical
    cross-engine; the noise is one codegen expression over the tiny
    aggregated relation.
    """
    from ..functions.vectors import round4
    from .sampling import hash_unit

    if epsilon <= 0 or clip <= 0:
        raise ValueError("epsilon and clip must be > 0")
    _require_non_float_groups(df, group_cols)
    v = F.col(value_col).cast("double")
    clipped = F.least(F.greatest(v, F.lit(0.0)), F.lit(float(clip)))
    micro = F.floor(clipped * 1_000_000 + F.lit(0.5)).cast("long")
    # NULL and NaN contributions are EXCLUDED, not zero-counted: an
    # unfiltered NULL would clip to 0.0 yet still inflate n_rows, and
    # a NaN passes isNotNull but clips to the FULL clip value in both
    # engines (least/greatest treat NaN as greatest — r14 review), so
    # every NaN measurement would silently contribute the maximum
    # possible amount.  ±inf stays: it is an extreme VALUE, and
    # clipping it to the bounds is exactly what bounded-contribution
    # clipping is for.  The released contributor count must mean
    # "rows that actually contributed".
    agg = (df.where(v.isNotNull() & ~F.isnan(v))
           .withColumn("_m", micro)
           .groupBy(*group_cols)
           .agg(F.sum("_m").alias("_sum_micro"),
                F.count(F.lit(1)).alias("n_rows")))
    u = hash_unit(_group_seed_key(group_cols), salt)
    noise = _laplace_noise(u, float(clip) / epsilon)
    # u is re-derived on the AGGREGATED relation (group cols survive
    # the groupBy untouched), so the draw matches the oracle's
    return agg.select(
        *group_cols, "n_rows",
        round4(F.col("_sum_micro") / 1e6).alias("true_sum"),
        round4(F.col("_sum_micro") / 1e6 + noise).alias("noisy_sum"))


def dp_noisy_sums_sql(group_cols: list[str], value: str, clip: float,
                      epsilon: float, salt: str = "dpsum",
                      from_table: str = "events") -> str:
    """DuckDB twin of :func:`dp_noisy_sums` — including the Spark
    side's parameter validation, so both halves reject the same bad
    arguments (r14 review: a clip <= 0 would silently release n·clip
    nonsense from the twin the operator itself refuses)."""
    from ..functions.vectors import ROUND4_SQL
    from .sampling import hash_unit_sql

    if epsilon <= 0 or clip <= 0:
        raise ValueError("epsilon and clip must be > 0")
    cols = ", ".join(group_cols)
    u = hash_unit_sql(_group_seed_key_sql(group_cols), salt)
    noise = _laplace_noise_sql(u, float(clip) / epsilon)
    clipped = (f"least(greatest(CAST({value} AS DOUBLE), 0.0), "
               f"{float(clip)!r})")
    return (
        f"WITH g AS (SELECT {cols}, "
        f"CAST(sum(CAST(floor({clipped} * 1000000 + 0.5) AS BIGINT)) "
        f"AS BIGINT) AS sum_micro, count(*) AS n_rows "
        f"FROM {from_table} "
        f"WHERE CAST({value} AS DOUBLE) IS NOT NULL "
        f"AND NOT isnan(CAST({value} AS DOUBLE)) "
        f"GROUP BY {cols}) "
        f"SELECT {cols}, n_rows, "
        + ROUND4_SQL.format(x="sum_micro / 1e6") + " AS true_sum, "
        + ROUND4_SQL.format(x=f"sum_micro / 1e6 + {noise}")
        + " AS noisy_sum FROM g")


def randomized_response(df: DataFrame, group_cols: list[str],
                        bit_col: str, p_truth: float = 0.75,
                        salt: str = "rr") -> DataFrame:
    """Warner-style randomized response (Warner 1965): each row
    reports its sensitive bit truthfully with probability ``p`` and
    flipped otherwise, then the group prevalence is debiased with
    ``π̂ = (obs + p − 1) / (2p − 1)`` — the local-privacy release
    shape for per-row sensitive attributes.  The coin is the seeded
    md5 unit draw on (salt, per-ROW key): seeding on the group key
    would flip entire groups together and destroy the estimator, so
    each row flips independently; seeded coins make the release
    reproducible and oracle-checkable (same HONESTY NOTE as
    :func:`dp_noisy_counts`: reproducibility, not formal privacy).

    ``bit_col`` must be boolean; rows with NULL bit are excluded.
    The caller must provide a row-unique ``_rr_key`` column (the
    draw's seed) — requiring it explicitly beats deriving one from
    monotonically_increasing_id, which is partitioning-dependent and
    would break the oracle.
    """
    from ..functions.vectors import round4
    from .sampling import hash_unit

    if not 0.5 < p_truth < 1.0:
        raise ValueError("p_truth must be in (0.5, 1)")
    if "_rr_key" not in df.columns:
        raise ValueError("randomized_response needs a row-unique "
                         "_rr_key column for the deterministic coin")
    # the coin seed gets the same float-key rejection the dp releases
    # apply to their group keys — double formatting diverges across
    # engines, so a float _rr_key would flip different rows in the
    # oracle with no error (r14 review)
    _require_non_float_groups(df, ["_rr_key"])
    b = F.col(bit_col).cast("boolean")
    u = hash_unit(F.col("_rr_key"), salt)
    # a NULL _rr_key gives a NULL draw, and `when(u < p).otherwise`
    # would send the row to the FLIP branch with probability 1 —
    # deterministically biasing the estimator with no error (r14
    # review).  assert in-plan instead (the t_closeness pattern).
    u_ok = F.assert_true(
        u.isNotNull(),
        F.lit("randomized_response: NULL _rr_key — the coin seed "
              "must be non-null and row-unique"))
    u = F.coalesce(u_ok.cast("double"), u)
    reported = F.when(u < F.lit(float(p_truth)), b).otherwise(~b)
    agg = (df.where(b.isNotNull())
           .select(*group_cols, b.alias("_b"),
                   reported.alias("_r"))
           .groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col("_r"), 1).otherwise(0))
                .alias("n_reported"),
                F.sum(F.when(F.col("_b"), 1).otherwise(0))
                .alias("_n_true")))
    p = float(p_truth)
    est = ((F.col("n_reported") / F.col("n_rows")) + F.lit(p - 1.0)) \
        / F.lit(2.0 * p - 1.0)
    return agg.select(
        *group_cols, "n_rows", "n_reported",
        round4(est).alias("est_prevalence"),
        round4(F.col("_n_true") / F.col("n_rows"))
        .alias("true_prevalence"))


def randomized_response_sql(group_cols: list[str], bit: str,
                            rr_key: str, p_truth: float = 0.75,
                            salt: str = "rr",
                            from_table: str = "events") -> str:
    """DuckDB twin of :func:`randomized_response` — including the
    Spark side's parameter validation (r14 review: p_truth=0.5 emits
    a divide-by-zero DuckDB evaluates to silent NULL, and p < 0.5
    sign-flips the estimator)."""
    from ..functions.vectors import ROUND4_SQL
    from .sampling import hash_unit_sql

    if not 0.5 < p_truth < 1.0:
        raise ValueError("p_truth must be in (0.5, 1)")
    p = float(p_truth)
    cols = ", ".join(group_cols)
    u = hash_unit_sql(rr_key, salt)
    return (
        f"WITH base AS (SELECT {cols}, "
        f"CAST({bit} AS BOOLEAN) AS b, "
        f"CASE WHEN ({u}) < {p!r} THEN CAST({bit} AS BOOLEAN) "
        f"ELSE NOT CAST({bit} AS BOOLEAN) END AS r "
        f"FROM {from_table} WHERE CAST({bit} AS BOOLEAN) IS NOT NULL), "
        f"g AS (SELECT {cols}, count(*) AS n_rows, "
        f"CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_reported, "
        f"CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_true "
        f"FROM base GROUP BY {cols}) "
        f"SELECT {cols}, n_rows, n_reported, "
        + ROUND4_SQL.format(
            x=f"((n_reported / CAST(n_rows AS DOUBLE)) + ({p - 1.0!r}))"
              f" / {2.0 * p - 1.0!r}")
        + " AS est_prevalence, "
        + ROUND4_SQL.format(x="n_true / CAST(n_rows AS DOUBLE)")
        + " AS true_prevalence FROM g")
