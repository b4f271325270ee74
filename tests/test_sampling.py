"""Deterministic sampling ops: the properties that matter are
re-run determinism, stability under corpus growth (no train/test
leakage), and the rank-limit pushdown on the per-group cap."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from dynamic_partitioner_spark.operators.sampling import (
    cap_per_group,
    hash_sample,
    hash_unit,
    split_assign,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_hash_sample_deterministic_and_near_fraction(spark):
    docs = spark.read.parquet(DOCS)
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
    assert a == b
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n          # ~20%, loose bound
    # different salts give (near-)independent samples
    c = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, salt="x").collect()}
    assert c != a


def test_hash_sample_is_growth_stable(spark):
    """A row's membership depends only on its key: sampling a superset
    keeps exactly the previous members (the property df.sample lacks)."""
    docs = spark.read.parquet(DOCS)
    half = docs.where(F.col("doc_id") < 250)
    small = {r.doc_id for r in hash_sample(half, "doc_id", 0.2).collect()}
    full = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
    assert small == {d for d in full if d < 250}


def test_split_assign_partitions_everything_stably(spark):
    docs = spark.read.parquet(DOCS)
    out = split_assign(docs, "doc_id")
    counts = dict(out.groupBy("split").count().collect())
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts.get("val", 0)
    # same key → same split on a disjoint re-read
    again = dict(split_assign(docs.select("doc_id"), "doc_id")
                 .select("doc_id", "split").collect())
    for r in out.select("doc_id", "split").collect():
        assert again[r.doc_id] == r.split


def test_cap_per_group_caps_and_is_deterministic(spark):
    docs = spark.read.parquet(DOCS)
    capped = cap_per_group(docs, "lang", "doc_id", 5)
    sizes = dict(capped.groupBy("lang").count().collect())
    orig = dict(docs.groupBy("lang").count().collect())
    for lang, n in sizes.items():
        assert n == min(5, orig[lang])
    a = sorted(r.doc_id for r in capped.collect())
    b = sorted(r.doc_id for r in cap_per_group(docs, "lang", "doc_id", 5)
               .collect())
    assert a == b


def test_cap_per_group_plans_rank_pushdown(spark):
    """The n<=N filter must plan as WindowGroupLimit so hot groups are
    pruned map-side before the exchange."""
    docs = spark.read.parquet(DOCS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cap_per_group(docs, "lang", "doc_id", 5).explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_hash_unit_range(spark):
    docs = spark.read.parquet(DOCS)
    stats = docs.select(hash_unit(F.col("doc_id")).alias("u")).agg(
        F.min("u").alias("lo"), F.max("u").alias("hi")).collect()[0]
    assert 0.0 <= stats.lo and stats.hi < 1.0


def test_mix_by_weights_proportions_and_determinism(spark):
    from dynamic_partitioner_spark.operators.sampling import mix_by_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    weights = {"src0": 0.5, "src1": 0.5}
    out = mix_by_weights(docs, "source", "doc_id", weights, 20)
    counts = dict(out.groupBy("source").count().collect())
    assert set(counts) <= {"src0", "src1"}       # unweighted sources dropped
    for s, n in counts.items():
        assert 2 <= n <= 18                      # ~10 each, loose hash bound
    again = sorted(r.doc_id for r in
                   mix_by_weights(docs, "source", "doc_id", weights, 20)
                   .collect())
    assert again == sorted(r.doc_id for r in out.collect())


def test_mix_by_weights_small_source_taken_whole(spark):
    from dynamic_partitioner_spark.operators.sampling import mix_by_weights

    df = spark.createDataFrame(
        [(i, "big") for i in range(100)] + [(1000, "tiny"), (1001, "tiny")],
        "doc_id long, source string")
    out = mix_by_weights(df, "source", "doc_id", {"big": 0.5, "tiny": 0.5}, 40)
    counts = dict(out.groupBy("source").count().collect())
    assert counts["tiny"] == 2                   # rate caps at 1, no upsample


def test_hash_unit_cross_engine_property(spark):
    """Property check: the Spark hash_unit and its DuckDB twin agree
    bit-for-bit on arbitrary integer and string keys (the whole
    portable-sampling contract rests on this)."""
    import duckdb

    from dynamic_partitioner_spark.operators.sampling import hash_unit_sql

    keys = [0, 1, -7, 2**31, 2**62, 999999999999]
    strs = ["", "a", "doc-123", "Ümlaut", "x" * 100]

    sdf = spark.createDataFrame([(k,) for k in keys], "k long")
    got_i = {r.k: r.u for r in sdf.select(
        "k", hash_unit(F.col("k")).alias("u")).collect()}
    con = duckdb.connect()
    for k in keys:
        want = con.execute(
            f"SELECT {hash_unit_sql(str(k))}").fetchone()[0]
        assert got_i[k] == want, k

    sdf2 = spark.createDataFrame([(s,) for s in strs], "k string")
    got_s = {r.k: r.u for r in sdf2.select(
        "k", hash_unit(F.col("k")).alias("u")).collect()}
    for s in strs:
        want = con.execute(
            "SELECT " + hash_unit_sql("?::VARCHAR").replace(
                "CAST(?::VARCHAR AS VARCHAR)", "?"), [s]).fetchone()[0]
        assert got_s[s] == want, s


def test_stratified_sample_per_stratum_rates(spark):
    from dynamic_partitioner_spark.operators.sampling import (
        stratified_sample)

    n = 4000
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(n)],
        "id long, s string")
    out = stratified_sample(df, "s", "id", {"a": 0.9, "b": 0.1})
    rates = {r.s: r.n for r in
             out.groupBy("s").count().withColumnRenamed("count", "n")
             .collect()}
    assert abs(rates["a"] / (n / 2) - 0.9) < 0.05
    assert abs(rates.get("b", 0) / (n / 2) - 0.1) < 0.05


def test_stratified_sample_default_fraction_zero_drops_unknown(spark):
    from dynamic_partitioner_spark.operators.sampling import (
        stratified_sample)

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    assert stratified_sample(df, "s", "id", {"x": 1.0}).count() == 1


def test_stratified_sample_deterministic(spark):
    from dynamic_partitioner_spark.operators.sampling import (
        stratified_sample)

    df = spark.createDataFrame([(i, "a") for i in range(500)],
                               "id long, s string")
    a = {r.id for r in stratified_sample(df, "s", "id", {"a": 0.4}).collect()}
    b = {r.id for r in stratified_sample(df, "s", "id", {"a": 0.4}).collect()}
    assert a == b


def test_temperature_mixture_flattens_and_is_deterministic(spark):
    """α=½ resampling: a 100× bigger source is taken at a much lower
    RATE (√-flattening) but still contributes more rows; membership is
    a pure function of (salt, key)."""
    from dynamic_partitioner_spark.operators.sampling import (
        temperature_mixture)

    rows = ([(i, "big") for i in range(4000)]
            + [(10_000 + i, "small") for i in range(40)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(df, "source", "doc_id", total_rows=400)
    got = out.groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in got}
    # rates: w_big=63, w_small=6, S=69 -> big ~ 400*63/(69*4000)=9.1%,
    # small ~ 400*6/(69*40)=87%
    assert by_src["small"] >= 25                 # high take-rate
    assert by_src["big"] > by_src["small"]       # but head still larger
    assert by_src["big"] < 4000 * 0.2            # flattened well below 100x
    again = temperature_mixture(df, "source", "doc_id", total_rows=400)
    assert {r.doc_id for r in out.collect()} == \
        {r.doc_id for r in again.collect()}


def test_topk_hash_sample_exact_k_and_nested(spark):
    """Exactly k rows, deterministic, and nested: the top-100 sample is
    a subset of the top-200 sample (ordering by the same draw)."""
    import pytest

    from dynamic_partitioner_spark.operators.sampling import (
        topk_hash_sample)

    cust = (spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
            .select("c_custkey"))
    s100 = {r.c_custkey for r in
            topk_hash_sample(cust, "c_custkey", 100).collect()}
    s50 = {r.c_custkey for r in
           topk_hash_sample(cust, "c_custkey", 50).collect()}
    again = {r.c_custkey for r in
             topk_hash_sample(cust, "c_custkey", 100).collect()}
    assert len(s100) == 100 and len(s50) == 50
    assert s50 < s100 and s100 == again
    with pytest.raises(ValueError):
        topk_hash_sample(cust, "c_custkey", 0)


def test_epoch_shuffle_balanced_deterministic_and_epoch_varies(spark):
    from dynamic_partitioner_spark.operators.sampling import epoch_shuffle

    cust = (spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
            .select("c_custkey"))
    e1 = epoch_shuffle(cust, "c_custkey", n_shards=8, epoch=1)
    rows = e1.collect()
    assert len(rows) == cust.count()             # permutation, no loss
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():               # dense 1..n ranks
        assert sorted(poss) == list(range(1, len(poss) + 1))
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[0] > 0.5 * sizes[-1]            # roughly balanced
    again = {(r.c_custkey, r.shard, r.pos) for r in e1.collect()}
    assert again == {(r.c_custkey, r.shard, r.pos) for r in rows}
    e2 = {(r.c_custkey, r.shard, r.pos) for r in
          epoch_shuffle(cust, "c_custkey", n_shards=8, epoch=2).collect()}
    assert e2 != again                           # epochs permute anew


def test_null_keys_are_handled_consistently(spark):
    """NULL keys: dropped from hash samples / top-k / epoch shuffle,
    split NULL (never the last-named split) in split_assign — and the
    DuckDB draw twin null-propagates like Spark's (|| vs concat)."""
    import duckdb

    from dynamic_partitioner_spark.operators.sampling import (
        epoch_shuffle, hash_sample, hash_unit_sql, split_assign,
        topk_hash_sample)

    df = spark.createDataFrame(
        [(None,)] * 30 + [(i,) for i in range(20)], "k long")
    assert all(r.k is not None for r in
               hash_sample(df, "k", 0.9).collect())
    top = topk_hash_sample(df, "k", 10).collect()
    assert len(top) == 10 and all(r.k is not None for r in top)
    sp = {r.k: r.split for r in split_assign(df, "k").collect()}
    assert sp[None] is None                       # unassigned, loudly
    assert all(v is not None for k, v in sp.items() if k is not None)
    sh = epoch_shuffle(df, "k", n_shards=4).collect()
    assert len(sh) == 20 and all(r.shard is not None for r in sh)
    # twin parity: NULL key draws NULL in DuckDB too
    assert duckdb.sql(
        f"SELECT {hash_unit_sql('NULL')}").fetchone()[0] is None


def test_split_assign_sql_twin_nulls(spark):
    import duckdb

    from dynamic_partitioner_spark.operators.sampling import (
        split_assign_sql)

    sql = split_assign_sql("k")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(None,), (1,), (2,)])
    rows = con.sql(f"SELECT k, {sql} AS s FROM t").fetchall()
    got = {k: s for k, s in rows}
    assert got[None] is None and got[1] is not None


def test_balance_classes_exact_min_count_per_label(spark):
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.sampling import balance_classes
    rows = ([(i, "a") for i in range(50)] + [(100 + i, "b") for i in range(7)]
            + [(200 + i, "c") for i in range(20)] + [(999, None)])
    df = spark.createDataFrame(rows, "id long, label string")
    kept = balance_classes(df, "label", "id")
    counts = {r.label: r.n for r in
              kept.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert counts == {"a": 7, "b": 7, "c": 7}
    # deterministic across invocations
    ids1 = sorted(r.id for r in kept.collect())
    ids2 = sorted(r.id for r in balance_classes(df, "label", "id").collect())
    assert ids1 == ids2


def test_poisson_bootstrap_deterministic_and_reasonable(spark):
    from dynamic_partitioner_spark.operators.sampling import (
        poisson_bootstrap)
    df = spark.createDataFrame([(i, 10.0) for i in range(500)],
                               "id long, v double")
    out = {r.replicate: (r.n_eff, r.boot_mean) for r in
           poisson_bootstrap(df, "id", "v", n_replicates=5).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for n_eff, mean in out.values():
        # constant metric → every replicate's mean is exactly 10
        assert mean == 10.0
        # Poisson(1) total weight concentrates near n
        assert 350 <= n_eff <= 650
    again = {r.replicate: (r.n_eff, r.boot_mean) for r in
             poisson_bootstrap(df, "id", "v", n_replicates=5).collect()}
    assert out == again


def test_weighted_sample_biases_by_weight_and_validates(spark):
    """A-ES race: with half the keys at weight 100 and half at weight
    1, a k=100 sample is dominated by heavy keys; exact size k; zero /
    negative weights and NULL keys are excluded; k<=0 raises."""
    import pytest

    from dynamic_partitioner_spark.operators.sampling import (
        weighted_sample)

    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(1000)]
    rows += [(None, 100.0), (2000, 0.0), (2001, -5.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "id", "w", k=100, salt="t").collect()
    assert len(got) == 100
    ids = [r.id for r in got]
    assert None not in ids and 2000 not in ids and 2001 not in ids
    heavy = sum(1 for i in ids if i % 2 == 0)
    # inclusion odds ∝ weight: heavy keys are 100x likelier — with a
    # fixed md5 salt this is deterministic, pinned well above the
    # ~50 an unweighted draw would give
    assert heavy >= 80
    # race keys are monotone in the output and deterministic on rerun
    again = weighted_sample(df, "id", "w", k=100, salt="t").collect()
    assert [r.id for r in again] == ids
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, "id", "w", k=0)


def test_weighted_sample_excludes_nan_weights_both_engines(spark):
    """code-review r6: a NaN weight passes `> 0` and then races as
    floor(NaN) — 0 in Spark's cast (always wins), NaN in DuckDB
    (always loses).  Both the operator and the SQL twin must exclude
    it, keeping the sample sets identical."""
    import duckdb

    from dynamic_partitioner_spark.operators.sampling import (
        weighted_sample, weighted_sample_sql)

    rows = [(i, 1.0) for i in range(10)] + [(99, float("nan"))]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r.id for r in weighted_sample(df, "id", "w", k=5,
                                         salt="t").collect()]
    assert 99 not in got and len(got) == 5

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, 1.0)" for i in range(10))
                + ", (99, CAST('nan' AS DOUBLE))) v(id, w)")
    oracle = [int(r[0]) for r in con.execute(
        weighted_sample_sql("id, w", "t", "id", "w", 5, "t")).fetchall()]
    assert oracle == got


def test_t_closeness_exact_tvd(spark):
    """Hand-computed TVD: class 'a' = {x:2, y:2} vs global {x:3, y:5};
    class 'b' = {x:1, y:3} — exact fractions, absent values counted."""
    from dynamic_partitioner_spark.operators.privacy import t_closeness

    rows = ([("a", "x")] * 2 + [("a", "y")] * 2
            + [("b", "x")] + [("b", "y")] * 3 + [("b", None)])
    df = spark.createDataFrame(rows, "q string, s string")
    got = {r.q: (r.n_class, r.tvd)
           for r in t_closeness(df, ["q"], "s").collect()}
    # global: x=3, y=5, n=8.  a: |2/4-3/8| + |2/4-5/8| = 1/8+1/8 → /2 = 1/8
    assert got["a"] == (4, 0.125)
    # b: |1/4-3/8| + |3/4-5/8| = 1/8+1/8 → /2 = 1/8
    assert got["b"] == (4, 0.125)
    # a class missing a global value entirely still scores it
    rows2 = [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")]
    df2 = spark.createDataFrame(rows2, "q string, s string")
    got2 = {r.q: r.tvd for r in t_closeness(df2, ["q"], "s").collect()}
    # each class: |1-1/2| + |0-1/2| = 1 → /2 = 0.5
    assert got2 == {"a": 0.5, "b": 0.5}


def test_t_closeness_null_quasi_class_scores_correctly(spark):
    """code-review r6: a NULL quasi value is a legitimate class — the
    null-safe grid join must use its real counts, not zero them (the
    null-unsafe form pinned every NULL class at tvd 0.5)."""
    from dynamic_partitioner_spark.operators.privacy import t_closeness

    # NULL class distribution == global distribution → tvd 0
    rows = ([(None, "x")] * 3 + [(None, "y")]
            + [("a", "x")] * 3 + [("a", "y")])
    df = spark.createDataFrame(rows, "q string, s string")
    got = {r.q: r.tvd for r in t_closeness(df, ["q"], "s").collect()}
    assert got == {None: 0.0, "a": 0.0}


def test_allocate_budget_exact_apportionment(spark):
    """Largest-remainder allocation: Σalloc == budget exactly, base
    floor respected, remainder seats go to the largest fractional
    parts with key tie-break."""
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.sampling import (
        allocate_budget)

    rows = [("a", 1, 10), ("a", 2, 20), ("b", 1, 25),
            ("c", 1, 30), ("d", 1, 1)]
    df = spark.createDataFrame(rows, "grp string, i int, w int")
    out = allocate_budget(df, ["grp"], "w", budget=100).collect()
    got = {r.grp: (r.w, r.alloc) for r in out}
    # weights: a=30, b=25, c=30, d=1, W=86
    assert got == {
        # base floor(100*w/86): a 34, b 29, c 34, d 1 → Σ98, leftover 2
        # remainders (100w mod 86): a 78, b 8, c 78, d 14 → a, c win
        "a": (30, 35), "b": (25, 29), "c": (30, 35), "d": (1, 1)}
    assert sum(a for _, a in got.values()) == 100

    # zero-weight group exists but never outranks real mass
    rows2 = rows + [("z", 1, 0)]
    df2 = spark.createDataFrame(rows2, "grp string, i int, w int")
    out2 = {r.grp: r.alloc
            for r in allocate_budget(df2, ["grp"], "w", 100).collect()}
    assert out2["z"] == 0
    assert sum(out2.values()) == 100

    import pytest as _pytest
    with _pytest.raises(ValueError):
        allocate_budget(df, ["grp"], "w", 0)


def test_importance_weights_reshapes_mixture(spark):
    """weight·corpus_share == target_share (to round4); absent-corpus
    target strata get NULL weight, untargeted strata weight 0."""
    import pytest as _pytest

    from dynamic_partitioner_spark.operators.sampling import (
        importance_weights)

    rows = [("en",)] * 60 + [("de",)] * 30 + [("xx",)] * 10
    df = spark.createDataFrame(rows, "lang string")
    out = {r.lang: r for r in importance_weights(
        df, "lang", {"en": 500, "de": 400, "ja": 100}).collect()}
    assert out["en"].weight == round(0.5 / 0.6, 4)
    assert out["de"].weight == round(0.4 / 0.3, 4)
    assert out["xx"].weight == 0.0       # not in target → excluded
    assert out["ja"].weight is None      # unfillable target mass
    assert out["ja"].n_rows == 0

    with _pytest.raises(ValueError):
        importance_weights(df, "lang", {"en": 700})   # ≠ 1000‰


def test_allocate_budget_edge_cases(spark):
    """Zero total mass allocates 0 everywhere (no ANSI divide-by-zero);
    the 128-bit product survives weights that overflow budget·w in
    BIGINT."""
    from dynamic_partitioner_spark.operators.sampling import (
        allocate_budget)

    zero = spark.createDataFrame(
        [("a", 0), ("b", 0)], "grp string, w long")
    out = {r.grp: r.alloc
           for r in allocate_budget(zero, ["grp"], "w", 100).collect()}
    assert out == {"a": 0, "b": 0}

    # w ≈ 2^62: budget·w overflows int64, must still be exact
    big = spark.createDataFrame(
        [("a", 4_611_686_018_427_387_904), ("b", 1)],
        "grp string, w long")
    out2 = {r.grp: r.alloc
            for r in allocate_budget(big, ["grp"], "w",
                                     1_000_000).collect()}
    assert sum(out2.values()) == 1_000_000
    assert out2["a"] == 1_000_000 and out2["b"] == 0


def test_kfold_assign_stability_and_uniformity(spark):
    """Folds are stable per key (growth cannot move a doc), roughly
    uniform, NULL keys get NULL fold, and k < 2 raises."""
    import pytest as _pytest

    from dynamic_partitioner_spark.operators.sampling import kfold_assign

    small = spark.createDataFrame([(i,) for i in range(200)], "id long")
    big = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    f_small = {r.id: r.fold for r in kfold_assign(small, "id", 5).collect()}
    f_big = {r.id: r.fold for r in kfold_assign(big, "id", 5).collect()}
    assert all(f_big[i] == f_small[i] for i in f_small)   # stability
    from collections import Counter
    sizes = Counter(f_big.values())
    assert set(sizes) == {0, 1, 2, 3, 4}
    assert max(sizes.values()) < 2 * min(sizes.values())  # rough uniform
    withnull = spark.createDataFrame([(None,), (1,)], "id long")
    got = {r.id: r.fold for r in kfold_assign(withnull, "id", 5).collect()}
    assert got[None] is None
    with _pytest.raises(ValueError):
        kfold_assign(small, "id", 1)


def test_neyman_allocation_dispersion_proportional(spark):
    """Constant stratum (IQR 0) weighs 0 — the whole budget goes to
    the spread stratum; membership checksum is deterministic."""
    from dynamic_partitioner_spark.operators.sampling import (
        neyman_allocation)

    rows = [("a", i, float(i)) for i in range(10)]          # IQR 4.5
    rows += [("b", 100 + i, 5.0) for i in range(10)]        # IQR 0
    df = spark.createDataFrame(rows, "s string, k long, v double")
    out = {r.s: r for r in
           neyman_allocation(df, "s", "k", "v", budget=6).collect()}
    assert out["a"].w == 45 and out["b"].w == 0      # (10·4.5e6)÷1e6
    assert out["a"].alloc == 6 and out["b"].alloc == 0
    assert out["a"].n_sampled == 6 and out["b"].n_sampled == 0
    assert out["b"].sampled_id_sum == 0
    # rerun → identical draw (hash, not RNG)
    again = {r.s: r.sampled_id_sum for r in
             neyman_allocation(df, "s", "k", "v", budget=6).collect()}
    assert again["a"] == out["a"].sampled_id_sum


def test_neyman_allocation_caps_at_stratum_size(spark):
    """Over-allocated strata draw every row they have (n_sampled =
    min(alloc, N_h)); NULL values are excluded from stats and draw."""
    from dynamic_partitioner_spark.operators.sampling import (
        neyman_allocation)

    rows = [("a", i, float(i)) for i in range(4)]
    rows += [("a", 99, None)]                       # excluded
    df = spark.createDataFrame(rows, "s string, k long, v double")
    r = neyman_allocation(df, "s", "k", "v", budget=10).collect()[0]
    assert r.n_rows == 4 and r.alloc == 10 and r.n_sampled == 4
    assert r.sampled_id_sum == 0 + 1 + 2 + 3


def test_cap_per_group_and_balance_drop_null_keys(spark):
    """r13 review: NULL keys draw NULL and sort NULLS FIRST in Spark
    but NULLS LAST in DuckDB — unfiltered they crowd caps/quotas
    nondeterministically on one engine only."""
    from dynamic_partitioner_spark.operators.sampling import (
        balance_classes, cap_per_group)

    df = spark.createDataFrame(
        [("g", None), ("g", None), ("g", "a"), ("g", "b"), ("g", "c")],
        "grp string, k string")
    kept = [r.k for r in cap_per_group(df, "grp", "k", 2).collect()]
    assert None not in kept and len(kept) == 2

    lab = spark.createDataFrame(
        [(0, None), (0, None), (0, 1), (1, 2)],
        "label long, k long")
    out = balance_classes(lab, "label", "k")
    got = [(r.label, r.k) for r in out.collect()]
    assert (0, None) not in got
    assert sorted(got) == [(0, 1), (1, 2)]


def test_poisson_bootstrap_null_rows_and_zero_neff(spark):
    """r13 review: a NULL key's draw failed every WHEN threshold and
    fell through to the MAXIMUM tail-cap weight 9; NULL values
    inflated n_eff with zero mass; and an all-zero-weight replicate
    fabricated boot_mean 0.0 via floor(NaN)."""
    from dynamic_partitioner_spark.operators.sampling import (
        poisson_bootstrap)

    df = spark.createDataFrame(
        [(None, 100.0), (1, None), (1, 10.0), (2, 10.0), (3, 10.0)],
        "k long, v double")
    out = poisson_bootstrap(df, "k", "v", n_replicates=5).collect()
    # NULL rows excluded entirely: every replicate's n_eff <= 3*9 and
    # every non-null mean is exactly 10 (all surviving values equal)
    for r in out:
        assert r.n_eff <= 27
        assert r.boot_mean in (None, 10.0)


def test_split_assign_rejects_negative_weight(spark):
    """r13 review: a negative weight passed the sum check and silently
    made its split unreachable."""
    import pytest

    from dynamic_partitioner_spark.operators.sampling import (
        split_assign, split_assign_sql)

    df = spark.createDataFrame([(1,)], "k long")
    w = {"train": 0.5, "val": -0.2, "test": 0.7}
    with pytest.raises(ValueError, match="must be > 0"):
        split_assign(df, "k", weights=w)
    with pytest.raises(ValueError, match="must be > 0"):
        split_assign_sql("k", weights=w)


def test_neyman_excludes_nan_values_and_null_keys(spark):
    """r13 review: one NaN made a stratum's IQR NaN — Spark silently
    collapsed its weight to 0 while the DuckDB twin's CAST errors;
    NULL keys ranked at opposite ends across engines."""
    from dynamic_partitioner_spark.operators.sampling import (
        neyman_allocation)

    df = spark.createDataFrame(
        [("s", i, float(i)) for i in range(1, 9)]
        + [("s", 99, float("nan")), ("s", None, 5.0)],
        "st string, k long, v double")
    r = neyman_allocation(df, "st", "k", "v", budget=4).collect()[0]
    assert r.n_rows == 8                  # NaN + NULL-key rows excluded
    assert r.n_sampled == 4


def test_r15_sampling_hardening(spark):
    """r15 module-review pins: (1) weighted_sample raises loudly on
    weights below ~5e-9 instead of Spark-silently saturating the race
    quantization to Long.MAX (while the SQL twin kept DOUBLE — a
    silent membership divergence); (2) poisson_bootstrap raises on
    values past the micro-unit range (Spark clamped silently, DuckDB
    errored); (3) temperature_mixture excludes NULL sources from the
    NORMALIZATION, not just the draw — their quota mass silently
    shrank every real source's rate; (4) neyman_allocation rejects
    non-integral keys (string keys summed to a useless 0 checksum);
    (5) epoch_shuffle/negative_pairs clamp the documented u == 1.0
    hash edge; (6) SQL-twin renders escape quotes in every
    data-derived literal (split names, strata, sources, targets,
    salts in the re-inlined renders)."""
    import math

    import pytest as _pytest

    from dynamic_partitioner_spark.operators.sampling import (
        importance_weights_sql, kfold_assign_sql, mix_by_weights_sql,
        neyman_allocation, poisson_bootstrap, poisson_bootstrap_sql,
        split_assign_sql, stratified_sample_sql, temperature_mixture,
        weighted_sample)

    tiny = spark.createDataFrame(
        [(1, 1e-12), (2, 1.0)], "id long, w double")
    with _pytest.raises(Exception, match="race quantization"):
        weighted_sample(tiny, "id", "w", k=1).collect()

    big = spark.createDataFrame(
        [(1, 1e13)], "id long, v double")
    with _pytest.raises(Exception, match="micro-unit"):
        poisson_bootstrap(big, "id", "v", n_replicates=2).collect()

    mixed = spark.createDataFrame(
        [(None, i) for i in range(400)]
        + [("a", 1000 + i) for i in range(100)],
        "src string, id long")
    out = temperature_mixture(mixed, "src", "id", total_rows=100)
    rows = out.collect()
    # NULL-source rows are unsampleable; with their mass excluded
    # from S, source 'a' (the only real source) takes rate 1 and the
    # full 100 rows survive (previously S included sqrt(400) and the
    # output fell far short)
    assert len(rows) == 100 and all(r.src == "a" for r in rows)

    s_key = spark.createDataFrame(
        [("s", "k1", 1.0)], "st string, k string, v double")
    with _pytest.raises(ValueError, match="integral key_col"):
        neyman_allocation(s_key, "st", "k", "v", budget=1)

    from dynamic_partitioner_spark.operators.sampling import (
        epoch_shuffle, negative_pairs)
    ids = spark.createDataFrame([(i,) for i in range(200)], "id long")
    sh = epoch_shuffle(ids, "id", n_shards=4, epoch=0)
    assert set(r.shard for r in sh.collect()) <= {0, 1, 2, 3}
    neg = negative_pairs(ids, "id", k=2, n_shards=4)
    assert all(r.id != r.neg_id for r in neg.collect())

    # twin renders survive quoted values (syntactically: DuckDB parses)
    import duckdb
    d = duckdb.connect()
    d.execute("CREATE TABLE t (k VARCHAR, s VARCHAR, v DOUBLE)")
    d.execute("INSERT INTO t VALUES ('a', 'o''reilly.com', 1.0)")
    for sql in (
        "SELECT " + split_assign_sql(
            "k", {"tr'ain": 0.5, "te'st": 0.5}, salt="s'alt") + " FROM t",
        stratified_sample_sql("k", "s", "k",
                              {"o'reilly.com": 0.5}, from_table="t"),
        mix_by_weights_sql("k", "s", "k", {"o'reilly.com": 1.0}, 10,
                           from_table="t"),
        importance_weights_sql("s", {"o'reilly.com": 500},
                               from_table="t"),
        "SELECT " + kfold_assign_sql("k", 3, salt="s'alt") + " FROM t",
        poisson_bootstrap_sql("k", "v", 2, salt="s'alt",
                              from_table="t"),
    ):
        d.execute(sql).fetchall()   # must parse and run
