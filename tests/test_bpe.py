"""BPE merge learning — deterministic sequence on a hand-checked
fixture, plus structural invariants on the real corpus shape."""

from __future__ import annotations

from dynamic_partitioner_spark.operators.bpe import (
    EOW,
    _merge_loop,
    learn_bpe_certified,
    learn_bpe_merges,
)


def test_merge_loop_hand_checked():
    # vocab: "low" x5, "lower" x2  (classic Sennrich example shape)
    vocab = [("low", 5), ("lower", 2)]
    merges = _merge_loop(vocab, 3)
    # round 1 pairs: (l,o)=7 (o,w)=7 (w,</w>)=5 (w,e)=2 (e,r)=2 (r,</w>)=2
    # tie 7/7 → lexicographically least pair (l,o)
    assert merges[0] == (1, "l", "o", "lo", 7)
    # round 2: (lo,w)=7 wins
    assert merges[1] == (2, "lo", "w", "low", 7)
    # round 3: (low,</w>)=5 wins
    assert merges[2] == (3, "low", EOW, "low" + EOW, 5)


def test_merge_loop_exhausts_gracefully():
    # single 1-char word: only pair is (a, </w>) — then nothing left
    assert _merge_loop([("a", 3)], 5) == [(1, "a", EOW, "a" + EOW, 3)]


def test_learn_bpe_merges_spark_matches_pure_python(spark):
    rows = [("low low low lower the the",), ("the low news news",)]
    df = spark.createDataFrame(rows, "text string")
    got = [(r.rank, r.left, r.right, r.merged, r.pair_count)
           for r in learn_bpe_merges(df, "text", n_merges=5)
           .orderBy("rank").collect()]
    vocab = [("low", 4), ("news", 2), ("the", 3), ("lower", 1)]
    want = _merge_loop(sorted(vocab, key=lambda kv: (-kv[1], kv[0])), 5)
    assert got == want


def test_learn_bpe_merges_ranks_are_contiguous(spark):
    df = spark.createDataFrame([("aa ab ba",)], "text string")
    out = learn_bpe_merges(df, "text", n_merges=4).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == \
        list(range(1, len(out) + 1))
    assert all(r.merged == r.left + r.right for r in out)


def test_learn_bpe_certified_exact_and_invariant_columns(spark):
    rows = [("low low low lower the the",), ("the low news news",)]
    df = spark.createDataFrame(rows, "text string")
    out = sorted(learn_bpe_certified(df, "text", n_merges=5).collect(),
                 key=lambda r: r.rank)
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    # rank 1 must equal the pure-python winner on the same vocab
    vocab = [("low", 4), ("news", 2), ("the", 3), ("lower", 1)]
    want = _merge_loop(sorted(vocab, key=lambda kv: (-kv[1], kv[0])), 1)[0]
    assert (out[0].left1, out[0].right1, out[0].merged1,
            out[0].count1) == want[1:]
    # tail rows carry NULL exact columns
    assert all(r.left1 is None and r.count1 is None for r in out[1:])
    # every invariant holds on a healthy run
    for r in out:
        assert r.count_nonincreasing and r.merged_is_concat
        assert r.merged_outside_base and r.mass_drop_in_bounds
        assert r.pairs_distinct


def test_merge_loop_with_mass_measures_the_dict():
    # "aaaa" x1: pairs (a,a)=3 counted, greedy applies only 2 merges
    # (aa aa </w>) — mass drop 2 is within (0, 3]
    merges = _merge_loop([("aaaa", 1)], 1, with_mass=True)
    rank, left, right, merged, c, mass = merges[0]
    assert (left, right, c) == ("a", "a", 3)
    assert mass == 3  # aa aa </w>
    initial = 5  # a a a a </w>
    assert 0 < initial - mass <= c
