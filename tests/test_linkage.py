"""Deletion-neighborhood fuzzy linkage: recall completeness vs the
brute-force quadratic join it replaces."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from dynamic_partitioner_spark.operators.linkage import fuzzy_pairs


def _brute(rows: list[tuple[int, str]],
           max_dist: int = 1) -> set[tuple[int, int]]:
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]
    return {(i, j) for (i, sa), (j, sb)
            in itertools.combinations(rows, 2) if lev(sa, sb) <= max_dist}


def test_fuzzy_pairs_edit_kinds(spark):
    rows = [(1, "market"), (2, "warket"),   # substitution
            (3, "marke"),                   # deletion
            (4, "markets"),                 # insertion (vs 1)
            (5, "arket"),                   # deletion at position 1
            (6, "bazaar")]                  # far away
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r.id_a, r.id_b): r.dist for r in
           fuzzy_pairs(df, "id", "s").collect()}
    assert set(got) == _brute(rows)
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert all(d <= 1 for d in got.values())
    # distance-2 pair (3 vs 4: delete+insert) must NOT appear
    assert (3, 4) not in got


def test_fuzzy_pairs_complete_recall_dense_space(spark):
    # dense random strings over a 2-letter alphabet: lots of true
    # distance-1 pairs of every kind, plus exact duplicates and the
    # empty string — recall must be 100% (the neighborhood guarantee)
    rng = random.Random(7)
    rows = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 4))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r.id_a, r.id_b) for r in fuzzy_pairs(df, "id", "s").collect()}
    assert got == _brute(rows)
    assert len(got) > 100          # the space really is dense


def test_fuzzy_pairs_emits_each_pair_once(spark):
    # "aa" vs "ab" share TWO deletion keys ("a" from either deletion of
    # "aa"? no — keys are distinct per record; the pair still surfaces
    # via multiple masks) — output must be distinct pairs
    df = spark.createDataFrame([(1, "aa"), (2, "ab")], "id long, s string")
    out = fuzzy_pairs(df, "id", "s").collect()
    assert len(out) == 1 and (out[0].id_a, out[0].id_b) == (1, 2)


def test_fuzzy_pairs_hot_key_guard(spark):
    """max_key_df drops only over-shared deletion keys: a pile of
    1-char ids all sharing the empty-string deletion key stops pairing
    through it, while a long-string pair (cold keys) is untouched;
    the exact default (None) keeps complete recall."""
    rows = [(i, "a") for i in range(30)]           # all share key ""
    rows += [(100, "warehouse"), (101, "warehous")]
    df = spark.createDataFrame(rows, "id long, s string")
    exact = {(r.id_a, r.id_b) for r in fuzzy_pairs(df, "id", "s").collect()}
    assert (100, 101) in exact
    assert len(exact) == 30 * 29 // 2 + 1
    capped = {(r.id_a, r.id_b) for r in
              fuzzy_pairs(df, "id", "s", max_key_df=10).collect()}
    assert (100, 101) in capped                    # cold pair survives
    assert all(a >= 100 for a, _ in capped)        # pile pairs gone


def test_fuzzy_pairs_d2_complete_recall(spark):
    # distance-2 radius over a dense 2-letter space: the 2-deletion
    # neighborhood must find EVERY lev<=2 pair the brute force finds
    rng = random.Random(13)
    rows = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 5))))
            for i in range(50)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_pairs(df, "id", "s", max_dist=2).collect()}
    assert set(got) == _brute(rows, max_dist=2)
    assert any(d == 2 for d in got.values())       # radius really used


def test_fuzzy_pairs_rejects_larger_radius(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "s", max_dist=3)


def test_deletion_keys_batched_matches_column_form(spark):
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.linkage import (
        deletion_keys, deletion_keys_batched)

    df = spark.createDataFrame(
        [("abc",), ("",), ("a",), ("héllo",), (None,)], "s string")
    both = df.select(deletion_keys("s").alias("col_form"),
                     deletion_keys_batched("s").alias("arrow"))
    assert both.where(F.col("col_form") != F.col("arrow")).count() == 0
    assert both.where(F.col("col_form").isNull()
                      != F.col("arrow").isNull()).count() == 0


def test_survivorship_takes_newest_non_null_per_column(spark):
    from dynamic_partitioner_spark.operators.linkage import survivorship

    rows = [
        (1, 10, "old-name", 5.0),       # oldest: has everything
        (1, 20, None, 7.0),             # newer: name missing
        (1, 30, "new-name", None),      # newest: balance missing
        (2, 1, None, None),             # cluster with all-null attrs
    ]
    df = spark.createDataFrame(rows, "cid long, seq long, name string, bal double")
    got = {r.cid: r for r in
           survivorship(df, "cid", "seq", ["name", "bal"]).collect()}
    assert got[1].name == "new-name"          # newest non-null name
    assert got[1].bal == 7.0                  # donated by the seq-20 row
    assert got[1].n_members == 3 and got[1].latest_seq == 30
    assert got[2].name is None and got[2].bal is None


def test_deletion_keys_batched_rejects_wide_radius(spark):
    """r14 review: max_dist=3 silently computed only the 2-deletion
    neighborhood, losing recall with no error for direct callers."""
    import pytest

    from dynamic_partitioner_spark.operators.linkage import (
        deletion_keys_batched)

    with pytest.raises(ValueError, match="1 or 2"):
        deletion_keys_batched("s", max_dist=3)


def test_cosine_batched_nulls_dirty_rows_like_column_form(spark):
    """r14 review: a NULL or batch-ragged vector pair previously
    raised numpy's inhomogeneous-shape error and killed the stage;
    it now returns NULL exactly like the Column-form cosine, and a
    consistent pair whose dimension differs from its batch neighbors
    still computes (per-dimension grouping, batch-independent)."""
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.functions.vectors import (
        cosine, cosine_batched)

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]),      # clean
         (2, None, [1.0, 0.0]),            # NULL side
         (3, [1.0, 0.0], [1.0]),           # ragged pair
         (4, [1.0, 2.0, 2.0], [1.0, 2.0, 2.0]),  # odd-dim, consistent
         (5, [0.0, 0.0], [1.0, 0.0])],     # zero norm
        "id long, a array<double>, b array<double>").coalesce(1)
    got = {r.id: (r.b_c, r.c_c) for r in df.select(
        "id",
        cosine_batched(F.col("a"), F.col("b")).alias("b_c"),
        cosine(F.col("a"), F.col("b")).alias("c_c")).collect()}
    assert got[1] == (1.0, 1.0)
    assert got[2] == (None, None)
    assert got[3][0] is None                # batched NULLs ragged pair
    assert abs(got[4][0] - 1.0) < 1e-12 and abs(got[4][1] - 1.0) < 1e-12
    assert got[5] == (None, None)


def test_fuzzy_pair_fold_is_spread_by_explicit_repartition(spark):
    """r16 plan pin: fuzzy_pairs' deletion-key self-join must carry the
    explicit-count hash repartition on _k (REPARTITION_BY_NUM) so the
    m²/2 candidate explode + levenshtein verify run cluster-wide, not
    on the source scan's 1-2 partitions (same fix as the r16 shingle
    join)."""
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(6)],
        "id long, s string").coalesce(1)
    out = fuzzy_pairs(df, "id", "s", max_dist=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
