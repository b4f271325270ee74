"""Binned range join + multi-grain rollup."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from dynamic_partitioner_spark.functions.eventtime import event_time_us
from dynamic_partitioner_spark.operators.relational import (
    range_join_binned,
    rollup_time_grains,
)


def _fixtures(spark):
    pts = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "pid long, t long")
    ivs = spark.createDataFrame(
        [(1, 25, 95), (2, 95, 105), (3, 900, 2000), (4, 380, 381)],
        "wid long, s long, e long")
    return pts, ivs


def test_range_join_matches_naive(spark):
    pts, ivs = _fixtures(spark)
    got = {(r.pid, r.wid) for r in
           range_join_binned(pts, ivs, "t", "s", "e", 64).collect()}
    naive = {(r.pid, r.wid) for r in
             pts.crossJoin(ivs)
             .where((F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
             .collect()}
    assert got == naive and naive            # same matches, non-empty
    # boundary semantics: start inclusive, end exclusive
    assert (90, 3) in got                    # t=900 == interval start
    assert (20, 3) not in got                # t=200 < start
    assert (38, 4) in got and (39, 4) not in got   # width-1 interval [380,381)


def test_range_join_no_duplicate_matches(spark):
    """An interval spanning many bins must still match each point once."""
    pts, _ = _fixtures(spark)
    wide = spark.createDataFrame([(1, 0, 1000)], "wid long, s long, e long")
    out = range_join_binned(pts, wide, "t", "s", "e", 16)
    assert out.count() == out.select("pid", "wid").distinct().count() == 100


def test_range_join_avoids_nested_loop(spark):
    """The whole point: the plan is an equi-join on the bin, never
    BroadcastNestedLoopJoin."""
    pts, ivs = _fixtures(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join_binned(pts, ivs, "t", "s", "e", 64).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_rollup_grains_are_consistent(spark):
    """Every grain sums to the same totals; coarser grains have fewer
    buckets; bucket starts are aligned to their width."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = rollup_time_grains(ev, event_time_us(ev, "ts"), "value").cache()
    tot = {r.grain: (r.n, r.buckets) for r in
           out.groupBy("grain").agg(F.sum("n_events").alias("n"),
                                    F.count(F.lit(1)).alias("buckets"))
           .collect()}
    n_events = ev.count()
    for grain, (n, _) in tot.items():
        assert n == n_events, grain
    assert tot["minute"][1] >= tot["hour"][1] >= tot["day"][1]
    bad = out.where((F.col("grain") == "hour")
                    & (F.col("bucket_start_us") % 3_600_000_000 != 0))
    assert bad.count() == 0


def test_salted_join_equals_plain_join(spark):
    """Same rows, same multiplicities as the unsalted join — including
    duplicate keys on BOTH sides."""
    from dynamic_partitioner_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i}") for i in range(60)],
        "lid long, k string")
    right = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("k3", 3), ("k6", 4), ("absent", 5)],
        "k string, rv long")
    plain = sorted(map(tuple, left.join(right, "k").select(
        "k", "lid", "rv").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", "lid", 4)
                        .select("k", "lid", "rv").collect()))
    assert salted == plain and plain
    # left/outer rows with no match survive a left join identically
    plain_l = sorted(map(tuple, left.join(right, "k", "left").select(
        "k", "lid", "rv").collect()))
    salted_l = sorted(map(tuple, salted_join(left, right, "k", "lid", 4,
                                             how="left")
                          .select("k", "lid", "rv").collect()))
    assert salted_l == plain_l


def test_funnel_strict_ordering(spark):
    """A user who purchased BEFORE clicking does not complete the
    funnel; in-order users do."""
    from dynamic_partitioner_spark.operators.relational import funnel

    rows = [  # (user, ts, type)
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),  # complete
        (2, 10, "view"), (2, 30, "click"),                       # no buy
        (3, 10, "purchase"), (3, 20, "view"), (3, 30, "click"),  # buy early
        (4, 10, "click"), (4, 20, "purchase"),                   # never viewed
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, et string")
    got = {r.step: r.n_users
           for r in funnel(df, "user_id", "ts", "et",
                           ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 3, "purchase": 1}


def test_profile_columns_values(spark):
    from dynamic_partitioner_spark.operators.relational import (
        profile_columns)

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "a")], "k long, s string")
    prof = {r.column: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert prof["k"].n_rows == 4 and prof["k"].n_nulls == 0
    assert prof["k"].n_distinct == 3
    assert (prof["k"].min_value, prof["k"].max_value) == ("1", "3")
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert (prof["s"].min_value, prof["s"].max_value) == ("a", "b")


def test_cdc_latest_upsert_and_delete(spark):
    from dynamic_partitioner_spark.operators.relational import cdc_latest

    # key 1: two upserts -> latest value wins
    # key 2: upsert then delete -> key disappears
    # key 3: delete then upsert -> key survives with the upsert value
    # key 4: single delete -> never appears
    ch = spark.createDataFrame(
        [(1, 1, "U", 10.0), (1, 2, "U", 20.0),
         (2, 1, "U", 30.0), (2, 2, "D", 0.0),
         (3, 1, "D", 0.0), (3, 2, "U", 40.0),
         (4, 1, "D", 0.0)],
        "k long, seq long, op string, v double")
    got = {(r.k, r.seq, r.v)
           for r in cdc_latest(ch, ["k"], "seq").collect()}
    assert got == {(1, 2, 20.0), (3, 2, 40.0)}


def test_cdc_latest_drops_op_column(spark):
    from dynamic_partitioner_spark.operators.relational import cdc_latest

    ch = spark.createDataFrame([(1, 1, "U", "x")],
                               "k long, seq long, op string, payload string")
    out = cdc_latest(ch, ["k"], "seq")
    assert out.columns == ["k", "seq", "payload"]


def test_cdc_latest_plans_window_group_limit(spark):
    """The rank-1 filter must push into the shuffle as WindowGroupLimit
    so executors never sort full per-key change history."""
    import contextlib
    import io

    from dynamic_partitioner_spark.operators.relational import cdc_latest

    ch = spark.createDataFrame([(1, 1, "U")], "k long, seq long, op string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cdc_latest(ch, ["k"], "seq").explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_snapshot_diff_classifies_all_change_kinds(spark):
    from dynamic_partitioner_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)],
        "k long, v double")
    new = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 30.0), (5, 50.0)],
        "k long, v double")
    got = {(r.k, r.change, r.v_old, r.v_new)
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {
        (2, "changed", 20.0, 99.0),
        (3, "changed", None, 30.0),      # NULL -> value IS a change
        (4, "removed", 40.0, None),
        (5, "added", None, 50.0),
    }                                     # key 1 unchanged -> absent


def test_snapshot_diff_null_in_present_row_not_misclassified(spark):
    """A present row whose compare column is NULL on both sides is
    unchanged — presence markers, not data columns, decide add/remove."""
    from dynamic_partitioner_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, None)], "k long, v double")
    assert snapshot_diff(old, new, ["k"], ["v"]).count() == 0


def test_cdc_latest_property_winner_is_max_seq(spark):
    """Property: for random change logs, cdc_latest returns exactly the
    max-seq non-delete winners of each key."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dynamic_partitioner_spark.operators.relational import cdc_latest

    @settings(max_examples=10, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 5),          # key
                  st.booleans()),             # is_delete
        min_size=1, max_size=30))
    def prop(changes):
        rows = [(k, seq, "D" if d else "U", float(seq))
                for seq, (k, d) in enumerate(changes)]
        df = spark.createDataFrame(rows, "k long, seq long, op string, v double")
        got = {(r.k, r.seq) for r in cdc_latest(df, ["k"], "seq").collect()}
        want = {}
        for k, seq, op, _ in rows:
            want[k] = (seq, op)
        expect = {(k, seq) for k, (seq, op) in want.items() if op != "D"}
        assert got == expect

    prop()


def test_transition_matrix_counts_and_probs(spark):
    from dynamic_partitioner_spark.operators.relational import (
        transition_matrix)
    # u1: A -> B -> A ; u2: A -> B  ==> (A,B)x2, (B,A)x1
    ev = spark.createDataFrame(
        [(1, 10, 1, "A"), (1, 20, 2, "B"), (1, 30, 3, "A"),
         (2, 10, 4, "A"), (2, 20, 5, "B")],
        "u long, t long, eid long, s string")
    got = {(r.from_state, r.to_state): (r.n_transitions, r.p) for r in
           transition_matrix(ev, "u", ["t", "eid"], "s").collect()}
    assert got == {("A", "B"): (2, 1.0), ("B", "A"): (1, 1.0)}


def test_transition_matrix_tiebreak_is_deterministic(spark):
    from dynamic_partitioner_spark.operators.relational import (
        transition_matrix)
    # equal timestamps: ordering falls to the second order column
    ev = spark.createDataFrame(
        [(1, 10, 2, "B"), (1, 10, 1, "A"), (1, 10, 3, "C")],
        "u long, t long, eid long, s string")
    got = {(r.from_state, r.to_state) for r in
           transition_matrix(ev, "u", ["t", "eid"], "s").collect()}
    assert got == {("A", "B"), ("B", "C")}


def test_transition_matrix_probs_sum_to_one_per_row(spark):
    from dynamic_partitioner_spark.operators.relational import (
        transition_matrix)
    import random
    rng = random.Random(3)
    rows = []
    eid = 0
    for u in range(20):
        for t in range(rng.randint(2, 12)):
            eid += 1
            rows.append((u, t, eid, rng.choice("XYZ")))
    ev = spark.createDataFrame(rows, "u long, t long, eid long, s string")
    out = transition_matrix(ev, "u", ["t", "eid"], "s").collect()
    by_from = {}
    for r in out:
        by_from.setdefault(r.from_state, 0.0)
        by_from[r.from_state] += r.p
    for s, total in by_from.items():
        assert abs(total - 1.0) < 2e-4          # round4 per cell


def test_histogram_fixed_buckets_and_sentinels(spark):
    from dynamic_partitioner_spark.operators.relational import (
        histogram_fixed)
    df = spark.createDataFrame(
        [(-5.0, 1.0), (0.0, 2.0), (9.99, 3.0), (10.0, 4.0), (25.0, 5.0),
         (100.0, 6.0), (140.0, 7.0)], "v double, q double")
    got = {r.bucket: (r.bucket_lo, r.n_rows, r.sum_q) for r in
           histogram_fixed(df, "v", 0.0, 100.0, 10, agg_col="q").collect()}
    assert got[0][1] == 1                     # underflow sentinel
    assert got[1] == (0.0, 2, 5.0)            # 0.0 and 9.99
    assert got[2] == (10.0, 1, 4.0)           # boundary lands in bucket 2
    assert got[3] == (20.0, 1, 5.0)
    assert got[11][1] == 2                    # hi is exclusive: 100 overflows
    assert 5 not in got                       # empty bins absent


def test_histogram_fixed_validates_args(spark):
    import pytest
    from dynamic_partitioner_spark.operators.relational import (
        histogram_fixed)
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", 0.0, 0.0, 10)
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", 0.0, 1.0, 0)


def test_cohort_retention_triangle(spark):
    from dynamic_partitioner_spark.operators.relational import (
        cohort_retention)
    import pyspark.sql.functions as F
    # u1 first day 0, active 0,1,3 (two events day 0 collapse)
    # u2 first day 1, active 1
    ev = spark.createDataFrame(
        [(1, 0), (1, 0), (1, 1), (1, 3), (2, 1)], "u long, d long")
    got = {(r.cohort_day, r.day_offset): r.n_users for r in
           cohort_retention(ev, "u", F.col("d")).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1}


def test_forward_fill_per_key(spark):
    from dynamic_partitioner_spark.operators.relational import forward_fill
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, 10.0), (1, 3, None), (1, 4, 20.0),
         (1, 5, None), (2, 1, None)],
        "k long, t long, v double")
    got = {(r.k, r.t): r.v for r in
           forward_fill(df, "k", ["t"], ["v"]).collect()}
    assert got == {(1, 1): None, (1, 2): 10.0, (1, 3): 10.0,
                   (1, 4): 20.0, (1, 5): 20.0, (2, 1): None}


def test_k_anonymize_suppresses_small_groups(spark):
    import pytest
    from dynamic_partitioner_spark.operators.privacy import k_anonymize
    rows = ([(i, "US", "A") for i in range(5)]
            + [(10, "FR", "A"), (11, "FR", "B")])
    df = spark.createDataFrame(rows, "id long, nation string, seg string")
    got = {r.id: (r.nation, r.seg, r.group_size) for r in
           k_anonymize(df, ["nation", "seg"], k=3).collect()}
    for i in range(5):
        assert got[i] == ("US", "A", 5)           # big group survives
    assert got[10] == ("*", "*", 1)               # singleton redacted
    assert got[11] == ("*", "*", 1)
    with pytest.raises(ValueError):
        k_anonymize(df, ["nation"], k=0)


def test_salted_join_rejects_right_preserving_types(spark):
    """right/full would emit unmatched right rows once per salt replica;
    the operator refuses rather than silently multiplying them."""
    import pytest

    from dynamic_partitioner_spark.operators.relational import salted_join

    left = spark.createDataFrame([(1, 10)], "k long, lid long")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, r string")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", "lid", 4, how=how)
    # left-preserving types stay accepted
    assert salted_join(left, right, "k", "lid", 4, "left_semi").count() == 1
    assert salted_join(left, right, "k", "lid", 4, "left_anti").count() == 0


def test_scd2_intervals_chain_and_single_current(spark):
    """Per key: intervals chain (valid_to == next valid_from), exactly
    one current version, count preserved."""
    from dynamic_partitioner_spark.operators.relational import scd2_build

    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "x")],
        "k long, seq long, v string")
    rows = sorted(scd2_build(df, ["k"], "seq", ["v"]).collect(),
                  key=lambda r: (r.k, r.valid_from))
    assert [(r.k, r.valid_from, r.valid_to, r.is_current, r.v)
            for r in rows] == [
        (1, 10, 20, False, "a"), (1, 20, 30, False, "b"),
        (1, 30, None, True, "c"), (2, 5, None, True, "x")]


def test_densify_fills_gaps_with_zeros(spark):
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.relational import (
        densify_time_buckets)

    H = 3_600_000_000
    rows = [(1, 0 * H + 5), (1, 0 * H + 10), (1, 3 * H + 1),  # gap 1,2
            (2, 7 * H)]
    df = spark.createDataFrame(rows, "k long, us long")
    out = {(r.k, r.bucket_idx): r.n_events for r in
           densify_time_buckets(df, "k", F.col("us")).collect()}
    assert out == {(1, 0): 2, (1, 1): 0, (1, 2): 0, (1, 3): 1, (2, 7): 1}


def test_densify_guards_pathological_spans(spark):
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from dynamic_partitioner_spark.operators.relational import (
        densify_time_buckets)

    H = 3_600_000_000
    df = spark.createDataFrame([(1, 0), (1, 100 * H)], "k long, us long")
    with pytest.raises(Exception) as ei:
        densify_time_buckets(df, "k", F.col("us"),
                             max_buckets=10).collect()
    assert "max_buckets" in str(ei.value)
    # within the limit it works
    ok = densify_time_buckets(df, "k", F.col("us"), max_buckets=1000)
    assert ok.count() == 101


def test_range_join_guards_huge_intervals(spark):
    import pytest

    pts = spark.createDataFrame([(1, 50)], "pid long, t long")
    huge = spark.createDataFrame([(1, 0, 10**12)], "wid long, s long, e long")
    with pytest.raises(Exception) as ei:
        range_join_binned(pts, huge, "t", "s", "e", 64,
                          max_bins_per_interval=100).collect()
    assert "max_bins_per_interval" in str(ei.value)


def test_salted_join_auto_equals_plain_join(spark):
    """Hot keys detected and salted, cold keys plain — union equals the
    unsalted join exactly, and the hot key really takes the salted
    path (its rows appear despite the split)."""
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.relational import (
        salted_join_auto)

    rows = [(i, 0 if i % 4 == 0 else i % 50) for i in range(2000)]
    left = spark.createDataFrame(rows, "row_id long, k long")
    right = (left.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
             .select("k", "n"))
    got = {(r.row_id, r.k, r.n) for r in
           salted_join_auto(left, right, "k", "row_id", n_salts=4,
                            hot_factor=3.0).collect()}
    plain = {(r.row_id, r.k, r.n) for r in
             left.join(right, "k").select("row_id", "k", "n").collect()}
    assert got == plain
    assert any(k == 0 for _, k, _n in got)      # hot slice present
    assert len(got) == 2000


def test_salted_join_auto_no_hot_keys_degenerates(spark):
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.relational import (
        salted_join_auto)

    left = spark.createDataFrame([(i, i % 10) for i in range(100)],
                                 "row_id long, k long")
    right = left.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    out = salted_join_auto(left, right, "k", "row_id", hot_factor=50.0)
    assert out.count() == 100                    # uniform → all cold path


def test_range_join_rejects_inverted_interval(spark):
    import pytest

    from dynamic_partitioner_spark.operators.relational import (
        range_join_binned)

    left = spark.createDataFrame([(5,)], "p long")
    bad = spark.createDataFrame([(10_000_000, 0)], "ws long, we long")
    with pytest.raises(Exception, match="inverted|max_bins"):
        range_join_binned(left, bad, "p", "ws", "we", 1000).collect()


def test_snapshot_diff_key_presence_only(spark):
    from dynamic_partitioner_spark.operators.relational import (
        snapshot_diff)

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {r.k: r.change for r in
           snapshot_diff(old, new, ["k"], []).collect()}
    assert got == {1: "removed", 3: "added"}


def test_cdc_latest_null_op_winner_is_upsert(spark):
    from dynamic_partitioner_spark.operators.relational import cdc_latest

    ch = spark.createDataFrame(
        [(1, 1, "D", "x"), (1, 2, None, "y"), (2, 1, "D", "z")],
        "k long, seq long, op string, v string")
    got = {r.k: r.v for r in cdc_latest(ch, ["k"], "seq").collect()}
    assert got == {1: "y"}                # NULL-op winner kept as upsert


# ---------------------------------------------------------------------
# seq_ngrams / ohlc_bars / key_skew_profile / group_split (round 5b)
# ---------------------------------------------------------------------

def test_seq_ngrams_counts_and_ranks(spark):
    from dynamic_partitioner_spark.operators.relational import seq_ngrams
    rows = [(1, i, t) for i, t in enumerate(["a", "b", "c", "a", "b", "c"])]
    rows += [(2, i, t) for i, t in enumerate(["a", "b", "c"])]
    df = spark.createDataFrame(rows, "uid long, seq long, st string")
    got = {(r.gram, r.n_seq, r.rnk) for r in
           seq_ngrams(df, "uid", ["seq"], "st", n=3, top=10).collect()}
    # user1: a>b>c, b>c>a, c>a>b, a>b>c ; user2: a>b>c
    assert ("a>b>c", 3, 1) in got
    assert {g for g, _, _ in got} == {"a>b>c", "b>c>a", "c>a>b"}


def test_seq_ngrams_top_cut_ties_break_on_gram(spark):
    from dynamic_partitioner_spark.operators.relational import seq_ngrams
    rows = [(1, 0, "x"), (1, 1, "y"), (2, 0, "a"), (2, 1, "b")]
    df = spark.createDataFrame(rows, "uid long, seq long, st string")
    got = [(r.gram, r.rnk) for r in
           seq_ngrams(df, "uid", ["seq"], "st", n=2, top=1).collect()]
    assert got == [("a>b", 1)]  # tie on count=1 → lexicographic gram


def test_seq_ngrams_delimiter_in_state_never_collides(spark):
    """ADVICE r5: states containing '>' must not merge distinct
    sequences — ('a>b', 'c') and ('a', 'b>c') encode differently."""
    from dynamic_partitioner_spark.operators.relational import seq_ngrams
    rows = [(1, 0, "a>b"), (1, 1, "c"), (2, 0, "a"), (2, 1, "b>c")]
    df = spark.createDataFrame(rows, "uid long, seq long, st string")
    got = {(r.gram, r.n_seq) for r in
           seq_ngrams(df, "uid", ["seq"], "st", n=2, top=10).collect()}
    assert len(got) == 2                  # NOT collapsed into one gram
    assert {n for _, n in got} == {1}


def test_seq_ngrams_null_mid_state_yields_no_gram(spark):
    """ADVICE r5: a NULL state anywhere in the window drops the gram —
    previously only the LAST step was checked, so a>NULL>c counted a
    2-gram as a 3-gram."""
    from dynamic_partitioner_spark.operators.relational import seq_ngrams
    rows = [(1, 0, "a"), (1, 1, None), (1, 2, "c"), (1, 3, "d")]
    df = spark.createDataFrame(rows, "uid long, seq long, st string")
    got = {r.gram for r in
           seq_ngrams(df, "uid", ["seq"], "st", n=3, top=10).collect()}
    assert got == set()                   # every 3-window touches the NULL


def test_state_transitions_drop_null_states_both_sides(spark):
    """ADVICE r5: a NULL state mid-sequence yields no transition in
    EITHER direction — pins the Spark/left_anti vs SQL/NOT IN
    NULL-semantics divergence closed."""
    from dynamic_partitioner_spark.operators.relational import (
        sequence_conformance, state_transitions)
    rows = [(1, 0, "a"), (1, 1, None), (1, 2, "b"), (1, 3, "c")]
    df = spark.createDataFrame(rows, "uid long, seq long, st string")
    steps = {(r.from_state, r.to_state)
             for r in state_transitions(df, "uid", ["seq"], "st").collect()}
    assert steps == {("b", "c")}
    viols = {(r.from_state, r.to_state) for r in sequence_conformance(
        df, "uid", ["seq"], "st", [("b", "c")]).collect()}
    assert viols == set()                 # no NULL-keyed phantom rows


def test_ohlc_bars_deterministic_open_close(spark):
    from dynamic_partitioner_spark.operators.relational import ohlc_bars
    rows = [(1, 0, 10, 5.0), (1, 0, 11, 9.0), (1, 0, 12, 2.0),
            (1, 1, 13, 7.0), (2, 0, 10, 4.0)]
    df = spark.createDataFrame(rows, "uid long, b long, ts long, v double")
    out = {(r.uid, r.bucket): r for r in
           ohlc_bars(df, "uid", F.col("b"), "v", ["ts"]).collect()}
    bar = out[(1, 0)]
    assert (bar.open, bar.high, bar.low, bar.close, bar.n_events) == \
        (5.0, 9.0, 2.0, 2.0, 3)
    assert out[(2, 0)].open == out[(2, 0)].close == 4.0


def test_key_skew_profile_flags_hot_key(spark):
    from dynamic_partitioner_spark.operators.relational import (
        key_skew_profile)
    rows = [(99,)] * 90 + [(i,) for i in range(10)]
    df = spark.createDataFrame(rows, "k long")
    out = key_skew_profile(df, "k", top=3).collect()
    assert [r.rnk for r in out] == [1, 2, 3]
    hot = out[0]
    assert hot.key == 99 and hot.n_rows == 90
    assert hot.share_ppm == 900_000
    # 90 rows * 11 keys / 100 rows = 9.9
    assert abs(hot.skew_ratio - 9.9) < 1e-9
    # ties among the 1-row keys break on key ascending
    assert out[1].key == 0 and out[2].key == 1


def test_group_split_never_splits_a_group(spark):
    from dynamic_partitioner_spark.operators.sampling import group_split
    rows = [(u, i) for u in range(50) for i in range(4)]
    df = spark.createDataFrame(rows, "uid long, item long")
    out = group_split(df, "uid")
    spans = (out.groupBy("uid")
             .agg(F.countDistinct("split").alias("n"))
             .where(F.col("n") > 1).count())
    assert spans == 0
    assert set(r.split for r in out.select("split").distinct().collect()) \
        <= {"train", "val", "test"}


def test_bloom_semi_join_equals_plain_semi_join(spark):
    from dynamic_partitioner_spark.operators.bloom import bloom_semi_join
    fact = spark.createDataFrame(
        [(i, i % 100) for i in range(2000)] + [(9999, None)],
        "id long, k long")
    dim = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "dk long")
    got = {r.id for r in
           bloom_semi_join(fact, dim, "k", "dk", n_bits=1 << 12).collect()}
    want = {r.id for r in
            fact.join(dim.withColumnRenamed("dk", "k").distinct(),
                      "k", "left_semi").collect()}
    assert got == want and len(got) > 0


def test_bloom_build_sets_expected_bits(spark):
    from dynamic_partitioner_spark.operators.bloom import (
        _bit_positions, build_bloom)
    dim = spark.createDataFrame([("a",), ("b",), (None,)], "k string")
    bits = build_bloom(dim, "k", n_bits=1 << 10, n_hashes=3)
    for key in ("a", "b"):
        assert all(bits[p] for p in _bit_positions(key, 3, 1 << 10))
    assert bits.sum() <= 6


def test_lag_features_values(spark):
    from dynamic_partitioner_spark.operators.relational import lag_features
    rows = [(1, 1, 10.0), (1, 2, 12.0), (1, 3, 11.0), (2, 1, 5.0)]
    df = spark.createDataFrame(rows, "uid long, seq long, v double")
    out = {(r.uid, r.seq): r for r in
           lag_features(df, "uid", ["seq"], "v",
                        n_lags=2, roll=3).collect()}
    r3 = out[(1, 3)]
    assert (r3.lag_1, r3.lag_2, r3.delta) == (12.0, 10.0, -1.0)
    assert abs(r3.roll_mean - 11.0) < 1e-9
    assert out[(2, 1)].lag_1 is None and out[(2, 1)].delta is None


def test_attribution_first_last_and_none(spark):
    from dynamic_partitioner_spark.operators.relational import attribution
    # user 1: click@10, view@20, purchase@25 → first=click, last=view
    # user 1: purchase@1000 (no touch within 100) → none
    # user 2: view@5, purchase@6 → first=last=view
    rows = [(1, 1, "click", 10), (1, 2, "view", 20), (1, 3, "purchase", 25),
            (1, 4, "purchase", 1000), (2, 5, "view", 5),
            (2, 6, "purchase", 6), (1, 7, "error", 24)]
    df = spark.createDataFrame(rows, "u long, id long, k string, ts long")
    got = {(r.model, r.channel): r.n_conversions for r in
           attribution(df, "u", "ts", "id", "k", ["click", "view"],
                       "purchase", lookback_us=100).collect()}
    assert got == {("first_touch", "click"): 1, ("first_touch", "view"): 1,
                   ("first_touch", "none"): 1, ("last_touch", "view"): 2,
                   ("last_touch", "none"): 1}


def test_attribution_tie_on_ts_breaks_on_id(spark):
    from dynamic_partitioner_spark.operators.relational import attribution
    rows = [(1, 1, "click", 10), (1, 2, "view", 10), (1, 3, "purchase", 11)]
    df = spark.createDataFrame(rows, "u long, id long, k string, ts long")
    got = {(r.model, r.channel) for r in
           attribution(df, "u", "ts", "id", "k", ["click", "view"],
                       "purchase", lookback_us=100).collect()}
    # same ts: min struct → id 1 (click), max struct → id 2 (view)
    assert got == {("first_touch", "click"), ("last_touch", "view")}


def test_bloom_semi_join_property_equals_semi_join(spark):
    """Property: bloom-pruned semi join == plain semi join for random
    fact/dim key sets (false positives verified away, no false
    negatives), across bloom sizes that force collisions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dynamic_partitioner_spark.operators.bloom import bloom_semi_join

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.integers(0, 40), min_size=1, max_size=60),
           st.lists(st.integers(0, 40), min_size=0, max_size=15),
           st.sampled_from([64, 256]))
    def prop(fact_keys, dim_keys, n_bits):
        fact = spark.createDataFrame(
            [(i, k) for i, k in enumerate(fact_keys)], "id long, k long")
        dim = spark.createDataFrame([(k,) for k in dim_keys] or [(None,)],
                                    "dk long")
        got = {r.id for r in
               bloom_semi_join(fact, dim, "k", "dk",
                               n_bits=n_bits, n_hashes=3).collect()}
        want = {i for i, k in enumerate(fact_keys) if k in set(dim_keys)}
        assert got == want

    prop()


def test_sequence_conformance_counts_disallowed_only(spark):
    from dynamic_partitioner_spark.operators.relational import (
        sequence_conformance)
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (2, 4, "a"), (2, 5, "c")]
    df = spark.createDataFrame(rows, "u long, seq long, k string")
    got = {(r.from_state, r.to_state): r.n_violations for r in
           sequence_conformance(df, "u", ["seq"], "k",
                                [("a", "b")]).collect()}
    assert got == {("b", "c"): 1, ("a", "c"): 1}

    import pytest
    with pytest.raises(ValueError):
        sequence_conformance(df, "u", ["seq"], "k", [])


def test_burst_detection_flags_spike_only(spark):
    from dynamic_partitioner_spark.operators.relational import (
        burst_detection)
    rows = []
    for b in range(10):
        n = 20 if b == 9 else 2          # spike in the last bucket
        rows += [("x", b)] * n
    rows += [("y", 0)] * 3               # no trailing history → never flagged
    df = spark.createDataFrame(rows, "t string, b long")
    out = burst_detection(df, "t", F.col("b"), min_count=5,
                          factor=2.0, trailing=24).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.t, r.bucket, r.n_events) == ("x", 9, 20)
    assert abs(r.trailing_mean - 2.0) < 1e-9


def test_burst_detection_fill_gaps_restores_true_baseline(spark):
    """A spike after a silent gap must be flagged when gaps are
    zero-filled, and can hide behind old busy buckets when not."""
    from dynamic_partitioner_spark.operators.relational import (
        burst_detection)
    rows = []
    for b in range(5):                    # busy prefix: 100 events each
        rows += [("x", b)] * 100
    rows += [("x", 40)] * 30              # spike after 35 silent buckets
    df = spark.createDataFrame(rows, "t string, b long")
    sparse = burst_detection(df, "t", F.col("b"), min_count=5,
                             factor=2.0, trailing=24).collect()
    assert all(r.bucket != 40 for r in sparse)   # hidden by old buckets
    filled = burst_detection(df, "t", F.col("b"), min_count=5,
                             factor=2.0, trailing=24,
                             fill_gaps=True).collect()
    assert any(r.bucket == 40 for r in filled)   # gap-true baseline ~0


def test_ewma_features_matches_recurrence_and_validates(spark):
    """EWMA left fold equals the hand recurrence acc' = acc/2 + x/2
    (seeded at 0) over the last-K frame; NULL values drop; K<1 raises."""
    import pytest

    from dynamic_partitioner_spark.operators.relational import ewma_features

    rows = [(1, i, float(v)) for i, v in enumerate([8, 4, 2, 6])]
    rows += [(2, 0, 10.0), (2, 1, None)]
    df = spark.createDataFrame(rows, "uid long, seq long, v double")
    got = {(r.uid, r.seq): r.ewma
           for r in ewma_features(df, "uid", ["seq"], "v",
                                  window_rows=3).collect()}

    def fold(vals):
        acc = 0.0
        for x in vals:
            acc = acc * 0.5 + x * 0.5
        return int(acc * 10000 + 0.5) / 10000   # round4

    assert got[(1, 0)] == fold([8])
    assert got[(1, 1)] == fold([8, 4])
    assert got[(1, 2)] == fold([8, 4, 2])
    assert got[(1, 3)] == fold([4, 2, 6])       # frame = last 3 only
    assert got[(2, 0)] == fold([10])
    assert (2, 1) not in got                     # NULL value dropped
    with pytest.raises(ValueError, match="window_rows"):
        ewma_features(df, "uid", ["seq"], "v", window_rows=0)


def test_target_encode_loo_values_and_singleton_null(spark):
    """LOO encoding equals the hand-computed other-rows mean; a
    singleton category encodes NULL (no leakage fallback)."""
    from dynamic_partitioner_spark.operators.relational import (
        target_encode_loo)

    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
            (4, "b", 7.5), (5, "b", 2.5), (6, "c", 99.0)]
    df = spark.createDataFrame(rows, "id long, cat string, t double")
    got = {r.id: r.target_loo
           for r in target_encode_loo(df, "cat", "t", "id").collect()}
    assert got[1] == 25.0 and got[2] == 20.0 and got[3] == 15.0
    assert got[4] == 2.5 and got[5] == 7.5
    assert got[6] is None                      # singleton → NULL


def test_robust_stats_median_mad_outliers(spark):
    """Hand-computed nearest-rank median/MAD and the 3-MAD cut; a
    single extreme value cannot drag the median (unlike the mean)."""
    import pytest

    from dynamic_partitioner_spark.operators.relational import robust_stats

    vals = [1.0, 2.0, 3.0, 4.0, 1000.0]       # median 3, devs [2,1,0,1,997]
    df = spark.createDataFrame([("a", v) for v in vals]
                               + [("b", 7.0), ("b", None)],
                               "g string, v double")
    got = {r.g: r for r in robust_stats(df, "g", "v").collect()}
    a = got["a"]
    assert (a.n_rows, a.median, a.mad) == (5, 3.0, 1.0)
    assert a.n_outliers == 1                   # only the 1000.0
    b = got["b"]                               # singleton: MAD 0, no outliers
    assert (b.n_rows, b.median, b.mad, b.n_outliers) == (1, 7.0, 0.0, 0)
    with pytest.raises(ValueError, match="outlier_k"):
        robust_stats(df, "g", "v", outlier_k=0)


def test_robust_stats_keeps_null_group(spark):
    """code-review r6: a NULL group survives (window partitions and
    GROUP BY keep it; the old equi-join silently dropped it)."""
    from dynamic_partitioner_spark.operators.relational import robust_stats

    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), ("a", 5.0)], "g string, v double")
    got = {r.g: (r.n_rows, r.median, r.mad)
           for r in robust_stats(df, "g", "v").collect()}
    assert got[None] == (2, 1.0, 0.0)
    assert got["a"] == (1, 5.0, 0.0)


def test_rfm_scores_tiling(spark):
    """RFM quintiles: scores span 1..n, tile sizes differ by ≤1, and
    a strictly larger metric never gets a smaller score."""
    from dynamic_partitioner_spark.operators.relational import rfm_scores

    rows = [(u, u * 1000 + e, u) for u in range(1, 24)
            for e in range(u % 3 + 1)]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value_u long")
    out = rfm_scores(df, "user_id", "ts_us", "value_u", n_tiles=5).collect()
    assert len(out) == 23
    for col in ("r_score", "f_score", "m_score"):
        vals = [r[col] for r in out]
        assert set(vals) == {1, 2, 3, 4, 5}
        from collections import Counter
        sizes = Counter(vals).values()
        assert max(sizes) - min(sizes) <= 1
    by_val = sorted(out, key=lambda r: (r.value_u, r.user_id))
    scores = [r.m_score for r in by_val]
    assert scores == sorted(scores)           # monotone in the metric


def test_auc_exact_known_values(spark):
    """Perfect separation -> 1.0, inverted -> 0.0, all-ties -> 0.5 via
    midranks; degenerate one-class input -> NULL."""
    from dynamic_partitioner_spark.operators.relational import auc_exact

    perfect = spark.createDataFrame(
        [(1.0, False), (2.0, False), (3.0, True), (4.0, True)],
        "s double, y boolean")
    assert auc_exact(perfect, "s", "y").collect()[0].auc == 1.0
    inverted = spark.createDataFrame(
        [(4.0, False), (3.0, False), (2.0, True), (1.0, True)],
        "s double, y boolean")
    assert auc_exact(inverted, "s", "y").collect()[0].auc == 0.0
    ties = spark.createDataFrame(
        [(1.0, True), (1.0, False), (1.0, True), (1.0, False)],
        "s double, y boolean")
    assert auc_exact(ties, "s", "y").collect()[0].auc == 0.5
    one_class = spark.createDataFrame(
        [(1.0, True), (2.0, True)], "s double, y boolean")
    assert auc_exact(one_class, "s", "y").collect()[0].auc is None
    # sklearn-checkable mixed case: scores [1,2,3,4], labels [0,1,0,1]
    mixed = spark.createDataFrame(
        [(1.0, False), (2.0, True), (3.0, False), (4.0, True)],
        "s double, y boolean")
    assert auc_exact(mixed, "s", "y").collect()[0].auc == 0.75


def test_seasonal_naive_eval_sparse_series(spark):
    """The forecast joins on the shifted BUCKET, not a row lag: gaps
    in the series pair correctly and gap-adjacent rows are excluded."""
    from dynamic_partitioner_spark.operators.relational import (
        seasonal_naive_eval)

    US = 1
    rows = [("a", 0, 10.0), ("a", 7, 13.0),    # pair: err 3
            ("a", 3, 5.0),                      # no bucket 10 -> not eval
            ("a", 14, 12.0),                    # pair with 7: err -1
            ("b", 100, 2.0)]                    # never evaluable
    df = spark.createDataFrame(rows, "k string, ts_us long, v double")
    out = {r.k: r for r in seasonal_naive_eval(
        df, "k", "ts_us", "v", season_buckets=7, bucket_us=US).collect()}
    assert "b" not in out
    a = out["a"]
    assert a.n_buckets == 2
    assert a.mae == 2.0                      # (3 + 1) / 2
    assert a.bias == 1.0                     # (3 - 1) / 2


def test_cusum_changepoint_finds_level_shift(spark):
    """A series that jumps from 1.0 to 5.0 at position 10 argmaxes the
    centered prefix deviation exactly at the shift; a constant series
    reports deviation 0; singleton series emit nothing."""
    from dynamic_partitioner_spark.operators.relational import (
        cusum_changepoint)

    rows = ([("a", i, 1.0) for i in range(10)]
            + [("a", i, 5.0) for i in range(10, 20)]
            + [("b", i, 2.0) for i in range(8)]
            + [("c", 0, 9.9)])
    df = spark.createDataFrame(rows, "k string, pos long, v double")
    out = {r.k: r for r in
           cusum_changepoint(df, "k", ["pos"], "v").collect()}
    assert out["a"].position == 10        # the shift point
    # |n·P − i·T|/(n·1e6) at i=10: |20·10e6 − 10·60e6|/(20·1e6) = 20
    assert out["a"].deviation == 20.0
    assert out["b"].deviation == 0.0
    assert "c" not in out                 # length-1 series: no interior


def test_km_survival_hand_checked(spark):
    """Textbook product-limit curve: censored subjects shrink the risk
    set without dropping survival; censor-only tail keeps S flat."""
    from dynamic_partitioner_spark.operators.relational import km_survival

    rows = [(1, 1), (1, 0), (2, 1), (3, 0)]
    df = spark.createDataFrame(rows, "duration long, event long")
    out = {r.duration: r for r in
           km_survival(df, "duration", "event").collect()}
    assert (out[1].n_at_risk, out[1].d_events) == (4, 1)
    assert out[1].survival == 0.75          # 1 - 1/4
    assert (out[2].n_at_risk, out[2].d_events) == (2, 1)
    assert out[2].survival == 0.375         # 0.75 * (1 - 1/2)
    assert (out[3].n_at_risk, out[3].d_events) == (1, 0)
    assert out[3].survival == 0.375         # censoring leaves S flat


def test_cusum_changepoint_survives_bigint_overflow(spark):
    """n·P beyond int64: the DECIMAL(38,0) product path must neither
    raise ARITHMETIC_OVERFLOW (ANSI) nor pick a wrapped argmax."""
    from dynamic_partitioner_spark.operators.relational import (
        cusum_changepoint)

    # 2000 rows of ~9.2e12 micro-units: P ~ 1.8e16, n*P ~ 3.7e19 > 2^63
    big = 9.2e6
    rows = ([("a", i, big) for i in range(1000)]
            + [("a", i, big * 3) for i in range(1000, 2000)])
    df = spark.createDataFrame(rows, "k string, pos long, v double")
    r = cusum_changepoint(df, "k", ["pos"], "v").collect()[0]
    assert r.position == 1000                  # shift found, no wrap
    assert r.series_len == 2000


def test_funnel_windowed_gap_constraint(spark):
    """A step completing AFTER the window does not count, and a later
    in-window occurrence of the same step rescues the user; the
    unconstrained funnel would count all of them."""
    from dynamic_partitioner_spark.operators.relational import (
        funnel, funnel_windowed)

    rows = [  # (user, ts, type)
        (1, 10, "view"), (1, 15, "click"), (1, 18, "purchase"),  # all in
        (2, 10, "view"), (2, 50, "click"),                       # click late
        (3, 10, "view"), (3, 12, "click"), (3, 90, "purchase"),  # buy late
        (4, 10, "view"), (4, 40, "click"), (4, 15, "click"),     # 2nd click
        # user 4: first click at 15 (in window), purchase at 20 in window
        (4, 20, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, et string")
    got = {r.step: r.n_users
           for r in funnel_windowed(df, "user_id", "ts", "et",
                                    ["view", "click", "purchase"],
                                    max_gap=10).collect()}
    assert got == {"view": 4, "click": 3, "purchase": 2}
    plain = {r.step: r.n_users
             for r in funnel(df, "user_id", "ts", "et",
                             ["view", "click", "purchase"]).collect()}
    assert plain["click"] == 4 and plain["purchase"] == 3


def test_interval_union_merges_touching_and_nested(spark):
    from dynamic_partitioner_spark.operators.relational import (
        interval_union)
    iv = spark.createDataFrame(
        [  # u1: [0,10] + [10,20] touch-merge; [30,40] separate
           ("u1", 0, 10), ("u1", 10, 20), ("u1", 30, 40),
           # u2: [0,100] swallows [10,20] and [90,150] extends it
           ("u2", 0, 100), ("u2", 10, 20), ("u2", 90, 150),
           # u3: single point interval
           ("u3", 5, 5)],
        "k string, s long, e long")
    got = {r.k: (r.n_islands, r.covered, r.longest)
           for r in interval_union(iv, "k", "s", "e").collect()}
    assert got["u1"] == (2, 30, 20)
    assert got["u2"] == (1, 150, 150)
    assert got["u3"] == (1, 0, 0)


def test_histogram_fixed_excludes_nulls(spark):
    """r13 review (verified): NULL values fell through every when() to
    least(NULL, n_bins) = n_bins, silently inflating the TOP in-range
    bucket."""
    from dynamic_partitioner_spark.operators.relational import (
        histogram_fixed)

    df = spark.createDataFrame([(5.0,), (None,), (None,)], "v double")
    rows = {r.bucket: r.n_rows
            for r in histogram_fixed(df, "v", 0, 10, 5).collect()}
    assert rows == {3: 1}                # bucket for 5.0 only


def test_target_encode_loo_keeps_null_categories(spark):
    """r13 review (verified): the null-unsafe equi-join silently
    dropped every NULL-category row from the output."""
    from dynamic_partitioner_spark.operators.relational import (
        target_encode_loo)

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, None, 5.0), (4, None, 7.0)],
        "id long, cat string, x double")
    got = {r.id: r.target_loo
           for r in target_encode_loo(df, "cat", "x", "id").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[3] == 7.0 and got[4] == 5.0   # NULL is its own category


def test_auc_exact_excludes_null_labels(spark):
    """r13 review (verified): a NULL label fell into otherwise(1) and
    counted as a NEGATIVE, inflating n_neg and depressing AUC."""
    from dynamic_partitioner_spark.operators.relational import auc_exact

    df = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.2, False), (0.5, None)],
        "s double, y boolean")
    r = auc_exact(df, "s", "y").collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (2, 1, 1.0)


def test_range_join_binned_null_bounds_match_nothing(spark):
    """r13 review (verified): a NULL bound made assert_true(NULL)
    abort the job with a misleading width-violation message — an open
    interval simply matches nothing."""
    from dynamic_partitioner_spark.operators.relational import (
        range_join_binned)

    left = spark.createDataFrame([(5,)], "p long")
    right = spark.createDataFrame(
        [(0, 10, "full"), (3, None, "open")],
        "s long, e long, tag string")
    got = [r.tag for r in range_join_binned(
        left, right, "p", "s", "e", bin_width=4).collect()]
    assert got == ["full"]


def test_snapshot_diff_null_keys_match(spark):
    """r13 review (verified): a NULL key component was double-reported
    as removed AND added for an identical unchanged row."""
    from dynamic_partitioner_spark.operators.relational import (
        snapshot_diff)

    old = spark.createDataFrame([(None, 1.0), ("k", 2.0)],
                                "k string, v double")
    new = spark.createDataFrame([(None, 1.0), ("k", 3.0)],
                                "k string, v double")
    got = {(r.k, r.change) for r in
           snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {("k", "changed")}     # NULL-key row matched, no diff


def test_salted_join_auto_spreads_hot_null_key(spark):
    """r13 review: NULL-key rows always fell to the cold path (the
    null-unsafe semi-join never matched the hot list), recreating the
    single-partition straggler; they route to the salted slice now and
    the left join still preserves them with NULL right columns."""
    from dynamic_partitioner_spark.operators.relational import (
        salted_join_auto)

    left = spark.createDataFrame(
        [(None, i) for i in range(200)] + [("k", 0)],
        "j string, lv long")
    right = spark.createDataFrame([("k", 9)], "j string, rv long")
    out = salted_join_auto(left, right, "j", "lv", how="left",
                           hot_factor=1.5, n_salts=4)
    assert out.count() == 201
    assert out.where("j IS NULL AND rv IS NOT NULL").count() == 0
    assert out.where("j = 'k'").collect()[0].rv == 9


def test_rfm_keeps_null_ts_event_mass(spark):
    """r13 review: the NULL-ts row filter also deleted the event's
    count and value mass; recency now coalesces to coldest while
    f/m keep the full mass."""
    from dynamic_partitioner_spark.operators.relational import (
        rfm_scores)

    df = spark.createDataFrame(
        [(1, 100, 10), (1, None, 50), (2, 200, 5)],
        "u long, ts long, v long")
    got = {r.u: (r.n_events, r.value_u, r.last_us)
           for r in rfm_scores(df, "u", "ts", "v").collect()}
    assert got[1] == (2, 60, 100)        # NULL-ts event still counts
    assert got[2] == (1, 5, 200)


def test_interval_union_rejects_inverted_interval(spark):
    """r13 review: an end < start row silently produced NEGATIVE
    covered/longest — it raises loudly now."""
    import pytest

    from dynamic_partitioner_spark.operators.relational import (
        interval_union)

    df = spark.createDataFrame([(1, 10, 5)], "k long, s long, e long")
    with pytest.raises(Exception, match="inverted interval"):
        interval_union(df, "k", "s", "e").collect()


def test_interval_union_tolerates_null_bounds(spark):
    """r13 advice: assert_true's NULL predicate aborted the whole job
    on a NULL start/end with the misleading 'inverted interval'
    message.  NULL-bound rows are excluded up front now (the
    range_join_binned posture), and genuinely inverted non-null rows
    still trip the assert."""
    from dynamic_partitioner_spark.operators.relational import (
        interval_union)

    df = spark.createDataFrame(
        [("u1", 0, 10), ("u1", None, 99), ("u1", 20, None),
         ("u2", None, None)],
        "k string, s long, e long")
    got = {r.k: (r.n_islands, r.covered, r.longest)
           for r in interval_union(df, "k", "s", "e").collect()}
    # only the fully-bounded row survives; u2 vanishes entirely
    assert got == {"u1": (1, 10, 10)}


def test_lag_features_guards_arguments(spark):
    """r13 review: bad arguments failed deep inside Spark with
    confusing frame/column errors."""
    import pytest

    from dynamic_partitioner_spark.operators.relational import (
        lag_features)

    df = spark.createDataFrame([(1, 1, 1.0)], "k long, t long, v double")
    with pytest.raises(ValueError, match="n_lags"):
        lag_features(df, "k", ["t"], "v", n_lags=0)
    with pytest.raises(ValueError, match="roll"):
        lag_features(df, "k", ["t"], "v", roll=0)


def test_r15_null_unsafe_grid_joins_fixed(spark):
    """r15 module-review pins: the null-unsafe USING grid joins
    fabricated zeros for NULL keys.  densify_time_buckets must
    preserve a NULL key's real counts; burst_detection with
    fill_gaps=True must flag a NULL type's burst exactly like
    fill_gaps=False does; trailing/min_count/factor validate at
    entry."""
    import pytest as _pytest

    from dynamic_partitioner_spark.operators.relational import (
        burst_detection, densify_time_buckets)

    ev = spark.createDataFrame(
        [(None, 1_000_000 * i) for i in range(5)]
        + [(None, 3_000_000)] * 7          # NULL key, busy bucket 3
        + [("a", 1_000_000)],
        "k string, us long")
    out = densify_time_buckets(ev, "k", F.col("us"), 1_000_000,
                               max_buckets=100)
    got = {(r.k, r.bucket_idx): r.n_events for r in out.collect()}
    assert got[(None, 3)] == 8             # real counts, not zeros
    assert got[(None, 0)] == 1 and got[("a", 1)] == 1

    burst = spark.createDataFrame(
        [(None, b) for b in range(10) for _ in range(2)]
        + [(None, 10)] * 50,
        "t string, b long")
    for fill in (False, True):
        flagged = burst_detection(
            burst.select("t", F.col("b")), "t", F.col("b"),
            min_count=10, factor=2.0, trailing=5, fill_gaps=fill)
        rows = flagged.collect()
        assert [(r.t, r.bucket, r.n_events) for r in rows] \
            == [(None, 10, 50)], f"fill_gaps={fill}"
    with _pytest.raises(ValueError, match="trailing"):
        burst_detection(burst, "t", F.col("b"), trailing=0)


def test_r15_loo_nulls_histogram_rounding_cohort_contract(spark):
    """r15 module-review pins: target_encode_loo counts only OBSERVED
    targets in the LOO denominator (a NULL-target sibling neither
    deflates the mean nor grants a singleton an encoding); the
    histogram sum uses the portable floor rounding; cohort operators
    exclude NULL users explicitly; seasonal_naive_eval excludes NULL
    keys explicitly."""
    from dynamic_partitioner_spark.operators.relational import (
        cohort_retention, cohort_value, histogram_fixed,
        seasonal_naive_eval, target_encode_loo)

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 4.0), (3, "a", None),
         (4, "b", 9.0), (5, "b", None)],
        "id long, cat string, t double")
    got = {r.id: r.target_loo
           for r in target_encode_loo(df, "cat", "t", "id").collect()}
    # cat a: two observed (2, 4) + one NULL -> LOO over the OTHER
    # observed value only; cat b: single observed + NULL -> no "other
    # rows", encodes NULL (not 0.0 / (n-1)-inflated)
    assert got == {1: 4.0, 2: 2.0, 3: None, 4: None, 5: None}

    h = spark.createDataFrame(
        [(5.0, 0.005), (15.0, 0.005)], "v double, q double")
    out = {r.bucket: r.sum_q
           for r in histogram_fixed(h, "v", 0.0, 20.0, 2,
                                    agg_col="q").collect()}
    # floor(0.005*100 + 0.5)/100 = 0.01 on both engines by definition
    assert out == {1: 0.01, 2: 0.01}

    ev = spark.createDataFrame(
        [(None, 1), (None, 2), (7, 1), (7, 2)],
        "u long, d long")
    ret = cohort_retention(ev, "u", F.col("d")).collect()
    assert {(r.cohort_day, r.day_offset, r.n_users) for r in ret} \
        == {(1, 0, 1), (1, 1, 1)}          # NULL user contributes 0
    cv = cohort_value(ev.withColumn("v", F.lit(1_000_000)),
                      "u", F.col("d"), F.col("v")).collect()
    assert all(r.n_active == 1 for r in cv) and len(cv) == 2

    sn = spark.createDataFrame(
        [(None, i * 3_600_000_000, 1.0) for i in range(400)]
        + [("k", i * 3_600_000_000, 1.0) for i in range(400)],
        "g string, us long, v double")
    rep = seasonal_naive_eval(sn, "g", "us", "v").collect()
    assert [r.g for r in rep] == ["k"]     # NULL key excluded, named


def test_r15_skew_profile_topk_plan_and_auc_cast_hole(spark):
    """r15 pins: (1) key_skew_profile's rnk <= top filter plans
    TakeOrderedAndProject under the window — the full key set never
    single-partitions (the r14/r15 reviews both flagged this shape;
    it is already bounded); (2) auc_exact excludes labels that cast
    to NULL boolean on non-ANSI sessions instead of counting them as
    negatives."""
    from dynamic_partitioner_spark.operators.relational import (
        auc_exact, key_skew_profile)

    df = spark.createDataFrame([(i % 7,) for i in range(100)],
                               "k long")
    prof = key_skew_profile(df, "k", top=3)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert prof.count() == 3

    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        scored = spark.createDataFrame(
            [(0.9, "true"), (0.8, "maybe"), (0.1, "false")],
            "s double, lab string")
        r = auc_exact(scored, "s", "lab").collect()[0]
        # 'maybe' casts to NULL boolean -> excluded, NOT a negative
        assert (r.n_pos, r.n_neg, r.auc) == (1, 1, 1.0)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
