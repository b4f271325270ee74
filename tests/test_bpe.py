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


def test_encode_bpe_hand_checked(spark):
    from dynamic_partitioner_spark.operators.bpe import (
        encode_bpe, learn_bpe_merges)
    df = spark.createDataFrame(
        [(1, "low lower lowest low"), (2, "new newer low")],
        "doc_id long, text string")
    m = [(r["left"], r["right"])
         for r in learn_bpe_merges(df, "text", n_merges=5)
         .orderBy("rank").collect()]
    got = {r.doc_id: (r.tokens, r.n_tokens)
           for r in encode_bpe(df, "doc_id", "text", m).collect()}
    # merges on this corpus: (l,o) (lo,w) (low,</w>) (e,r) (e,w)
    assert got[1][0] == ["low</w>", "low", "er", "</w>",
                         "low", "e", "s", "t", "</w>", "low</w>"]
    assert got[2][0] == ["n", "ew", "</w>", "n", "ew", "er", "</w>",
                         "low</w>"]
    assert got[1][1] == 10 and got[2][1] == 8


def test_encode_bpe_roundtrip_and_mass(spark):
    """Lossless: stripping EOW re-joins to the normalized text; token
    counts sit between word count and raw symbol count; encoding with
    ZERO merges returns exactly chars+EOW per word."""
    from dynamic_partitioner_spark.operators.bpe import (
        EOW, encode_bpe, learn_bpe_merges)
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(100)
    m = [(r["left"], r["right"])
         for r in learn_bpe_merges(docs, "text", n_merges=10)
         .orderBy("rank").collect()]
    enc = encode_bpe(docs, "doc_id", "text", m)
    rows = {r.doc_id: r for r in enc.collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    import re
    for did, r in rows.items():
        words = [w for w in re.split(r"[ \t\n\r]+",
                                     texts[did].strip().lower()) if w]
        joined = "".join(r.tokens).replace(EOW, " ").rstrip()
        assert joined == " ".join(words), did
        assert len(words) <= r.n_tokens <= sum(len(w) + 1
                                               for w in words)
    zero = {r.doc_id: r.n_tokens
            for r in encode_bpe(docs, "doc_id", "text", []).collect()}
    for did in rows:
        words = [w for w in re.split(r"[ \t\n\r]+",
                                     texts[did].strip().lower()) if w]
        assert zero[did] == sum(len(w) + 1 for w in words)


def test_encode_bpe_reproduces_trainer_word_table(spark):
    """A corpus encoded with its own learned merges must land on the
    trainer's final word table exactly (same greedy scan)."""
    from dynamic_partitioner_spark.operators.bpe import (
        _merge_loop, _word_counts, encode_bpe, learn_bpe_merges)
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    vocab = _word_counts(docs, "text", 50_000)
    merges = _merge_loop(vocab, 8)
    m = [(t[1], t[2]) for t in merges]
    # rebuild the trainer's final words by replaying the loop
    words = {tuple(w) + ("</w>",): n for w, n in vocab}
    for a, b in m:
        nxt = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a \
                        and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
        words = nxt
    trainer = set(words)
    enc = encode_bpe(docs, "doc_id", "text", m)
    toks = {r.doc_id: list(r.tokens) for r in enc.collect()}
    # split each doc's token stream back into per-word symbol tuples
    seen = set()
    for did, ts in toks.items():
        cur = []
        for t in ts:
            cur.append(t)
            if t.endswith("</w>"):
                seen.add(tuple(cur))
                cur = []
        assert cur == [], f"doc {did}: trailing symbols without EOW"
    assert seen <= trainer, sorted(seen - trainer)[:5]


def test_encode_bpe_roundtrip_property():
    """Hypothesis: for ANY word list and ANY merge prefix learned from
    it, the per-word greedy scan is lossless (concatenating a word's
    symbols and stripping EOW reproduces the word) and the symbol
    count stays within [1, len(word)+1] — pure-Python twin of the
    Arrow UDF's inner loop (same word_syms logic)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dynamic_partitioner_spark.operators.bpe import EOW, _merge_loop

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.text(alphabet="abc", min_size=1, max_size=8),
                    min_size=1, max_size=12),
           st.integers(1, 6))
    def prop(words, n_merges):
        vocab = {}
        for w in words:
            vocab[w] = vocab.get(w, 0) + 1
        merges = _merge_loop(sorted(vocab.items()), n_merges)
        pairs = [(t[1], t[2]) for t in merges]
        for w in words:
            syms = list(w) + [EOW]
            for a, b in pairs:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a \
                            and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            joined = "".join(syms)
            assert joined == w + EOW, (w, syms)
            assert 1 <= len(syms) <= len(w) + 1

    prop()
