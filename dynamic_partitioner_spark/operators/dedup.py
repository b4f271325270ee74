"""Deduplication operators for large-scale training-data pipelines
(north-star extension surface; the reference itself has no dedup — its
only grouping is the physical per-key writer fan-out, SURVEY.md §2.4).

Five families, all shuffle-aware:

* **exact**      — hash-aggregate on the dedup key (map-side combine).
* **minhash**    — shingle → k-permutation MinHash signature → banded
                   LSH bucketing → candidate pairs → exact-Jaccard verify.
                   Everything up to the band join is a narrow map; the
                   only shuffle is on (band_idx, band_hash), the same
                   shape Spark ML's MinHashLSH uses.
* **simhash**    — 32-bit SimHash (functions/text.py SIMHASH_BITS) +
                   hamming-distance pairing inside blocking groups
                   (bit_count(xor) is JVM-side).
* **ngram-jaccard** — exact pairwise Jaccard inside a blocking key;
                   quadratic per block, the *oracle-checkable* baseline
                   the sketches approximate.
* **embedding**  — cosine near-dup inside a blocking key.

All hash functions are deterministic (xxhash64 with literal seeds, md5)
so every run — and the driver's re-run — produces identical output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm, round4
from ..functions.checkpoint import checkpoint_df
from ..functions.text import simhash_batched

# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep-lowest-id representative per duplicate group + group size.
    One hash-aggregate shuffle on the key; deterministic (unlike
    ``dropDuplicates``, which keeps an arbitrary row).

    Rows with ANY NULL key column pass through UNDEDUPED (their own
    id, ``dup_count`` 1): a NULL key identifies nothing, and groupBy
    treats NULLs as equal — a corpus of NULL-key rows would otherwise
    collapse to ONE survivor (the incremental_dedup NULL-fingerprint
    rule applied here too, r15 review).  Implemented as an extra
    grouping column (the row's own id when any key is NULL, NULL
    otherwise), so the plan stays ONE hash aggregate — no union, no
    second scan."""
    from functools import reduce as _reduce
    some_null = _reduce(lambda x, y: x | y,
                        [F.col(c).isNull() for c in key_cols])
    # bump the helper grouping name past any same-named key column:
    # a literal "_solo" key would otherwise yield TWO _solo output
    # columns and drop() would remove both (r15 ADVICE — the same
    # collision guard incremental_dedup's _fp/_rn already carry)
    solo = "_solo"
    while solo in key_cols or solo == id_col:
        solo += "_"
    return (df.groupBy(*key_cols,
                       F.when(some_null, F.col(id_col)).alias(solo))
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count"))
            .drop(solo))


def distinct_rows(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    return df.select(*(cols or df.columns)).distinct()


# ---------------------------------------------------------------- minhash

def tokens(c: Column) -> Column:
    return F.split(F.trim(F.lower(c)), "[ \\t\\n\\r]+")


def ngrams_all(c: Column, n: int = 3) -> Column:
    """All n-word grams (space-joined, order-preserving, duplicates
    kept) of a text column.

    Built as a chain of ``zip_with`` against offset slices of the token
    array — each lambda touches only its elements, so the whole thing
    stays O(tokens) per row.  (The obvious ``transform(sequence(1, cnt),
    i -> array_join(slice(toks, i, n)))`` form re-evaluates the token
    subexpression per shingle index and measured ~7× slower.)  Slots
    past the end of a short document zip against NULL and are filtered,
    so short texts yield an empty array.
    """
    toks = tokens(c)
    sz = F.size(toks)
    acc = toks
    for offset in range(2, n + 1):
        nxt = F.slice(toks, offset, F.greatest(sz - (offset - 1), F.lit(1)))
        acc = F.zip_with(
            acc, nxt,
            lambda a, b: F.when(a.isNull() | b.isNull(), F.lit(None))
            .otherwise(F.concat_ws(" ", a, b)))
    return F.filter(acc, lambda x: x.isNotNull())


def shingles(c: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined) of a text column; see
    :func:`ngrams_all` for the O(tokens) construction."""
    return F.array_distinct(ngrams_all(c, n))


def ngrams_all_batched(c: Column, n: int = 3) -> Column:
    """Arrow-batched :func:`ngrams_all` (duplicates kept, order
    preserved) — element-for-element identical, pinned by
    ``tests/test_dedup.py``; same interpreted-HOF rationale as
    :func:`shingles_batched`."""
    import re

    ws = re.compile(r"[ \t\n\r]+")

    @F.pandas_udf("array<string>")
    def _ng(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            toks = ws.split(t.lower().strip(" "))
            if len(toks) < n:
                out.append([])
                continue
            out.append([" ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1)])
        return pd.Series(out)

    return _ng(c)


def shingles_batched(c: Column, n: int = 3) -> Column:
    """Arrow-batched :func:`shingles` — element-for-element identical
    output (same tokenization: lower → trim spaces → split on
    ``[ \\t\\n\\r]+`` keeping empty edge tokens; same first-occurrence
    distinct order), pinned by ``tests/test_dedup.py``.

    Higher-order functions (``zip_with``/``filter``) evaluate outside
    whole-stage codegen, so the Column form is interpreted per element;
    one Arrow batch pass measured ~10× faster on the documents corpus.
    Used on every shingle hot path; the Column form remains the
    engine-side twin of the DuckDB oracle's ``string_split_regex``
    construction."""
    import re

    ws = re.compile(r"[ \t\n\r]+")

    @F.pandas_udf("array<string>")
    def _sh(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)   # NULL in → NULL out, like the HOF form
                continue
            toks = ws.split(t.lower().strip(" "))
            if len(toks) < n:
                out.append([])
                continue
            out.append(list(dict.fromkeys(
                " ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1))))
        return pd.Series(out)

    return _sh(c)


_MERSENNE_P = (1 << 31) - 1


def _affine_params(k: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs for the universal hash family
    h_i(x) = (a_i·x + b_i) mod p, a_i ∈ [1, p), b_i ∈ [0, p)."""
    import random
    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
            for _ in range(k)]


def minhash_signature(shingle_col: Column, k: int = 32) -> Column:
    """k-permutation MinHash via one base hash + k affine permutations:
    base(s) = xxhash64(s) mod p (p = 2³¹−1), sig[i] = min over shingles
    of (aᵢ·base + bᵢ) mod p.

    One O(strlen) hash per shingle instead of k (the standard universal-
    hash MinHash construction); the k permutations are mult-adds over
    the cached base array.  All operands stay below 2⁶² so ANSI-mode
    bigint overflow can't fire.  Literal (aᵢ, bᵢ) → fully deterministic.
    """
    def _affine(a: int, b: int):
        # closure factory: default-arg lambdas would add parameters that
        # pyspark's higher-order-function arity inspection miscounts
        return lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(_MERSENNE_P))

    bases = F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s),
                                                      F.lit(_MERSENNE_P)))
    return F.array(*[
        F.array_min(F.transform(bases, _affine(a, b)))
        for a, b in _affine_params(k)
    ])


def shingle_bases(shingle_col: Column) -> Column:
    """xxhash64 of each shingle mod p — the ONE string-hash pass, kept
    JVM-side (hashing strings in Python would dominate)."""
    return F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s),
                                                     F.lit(_MERSENNE_P)))


def minhash_signature_batched(bases_col: Column, k: int = 32) -> Column:
    """Arrow-batched k-permutation MinHash over a pre-hashed base array
    (:func:`shingle_bases`), numerically identical to
    :func:`minhash_signature`: the k affine mod-min reductions run as
    one (k × shingles) int64 numpy pass per row instead of k
    interpreted ``transform``/``array_min`` expression passes (Spark
    evaluates higher-order functions outside codegen — same pattern as
    the batched SimHash).  Empty shingle arrays yield [NULL]*k, exactly
    like ``array_min`` over an empty array, so empty-document bucket
    behavior (and the hot-bucket cap that relies on it) is unchanged."""
    params = _affine_params(k)
    A = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    B = np.array([p[1] for p in params], dtype=np.int64)[:, None]
    empty = [None] * k

    @F.pandas_udf("array<long>")
    def _sig(bases: pd.Series) -> pd.Series:
        out = []
        for b in bases:
            if b is None:
                # NULL shingles → [NULL]*k, exactly like the Column
                # twin (array_min over NULL); np.asarray(None) raises
                out.append(empty)
                continue
            arr = np.asarray(b, dtype=np.int64)
            if arr.size == 0:
                out.append(empty)
            else:
                # a·base + b < 2^62 — no int64 overflow (a, base < 2^31)
                out.append(((A * arr[None, :] + B) % _MERSENNE_P)
                           .min(axis=1).tolist())
        return pd.Series(out)

    return _sig(bases_col)


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str, sig_col: str = "sig",
                        bands: int = 8, rows_per_band: int = 4,
                        max_bucket_size: int | None = 10_000) -> DataFrame:
    """Banded LSH: docs sharing any band hash become a candidate pair.

    The band explode is narrow; the self-join shuffles on
    (band_idx, band_hash) — at 100 TB this is the dominant (and only)
    shuffle, keyed well because band hashes are uniform xxhash64 values.

    ``max_bucket_size`` guards the quadratic term: a degenerate bucket
    (every empty doc shares one band hash) of size m yields m²/2 pairs —
    one 10⁷-doc hot bucket is 5·10¹³ pairs, a job-killer.  Buckets above
    the cap are dropped via a broadcast anti-join on the (tiny) hot-
    bucket list; members of a dropped bucket still pair through their
    other bands.  Pass None to disable (exhaustive audits).
    """
    # bands×rows_per_band must fit the signature: trailing bands would
    # otherwise hash EMPTY slices shared by every doc — one degenerate
    # bucket of the whole corpus (n²/2 pairs in uncapped mode).  The
    # wrapper validated against its own k; the public entry point must
    # too (r15 review).  IN-PLAN assert, not a driver probe: an eager
    # .first() here re-ran the upstream shingle+signature pipeline as
    # an extra job per call, measurably slowing every minhash-chain
    # key (r15 bench) — the coalesce-over-assert rides the first
    # band's hash at zero extra jobs and raises at execution with the
    # same named error.  NULL signatures pass (coalesce True) and
    # bucket like before.
    sig_len_ok = F.assert_true(
        F.coalesce(F.size(F.col(sig_col))
                   >= F.lit(bands * rows_per_band), F.lit(True)),
        F.concat(
            F.lit(f"lsh_candidate_pairs: bands×rows_per_band = "
                  f"{bands * rows_per_band} exceeds the signature "
                  f"length "),
            F.size(F.col(sig_col)).cast("string"),
            F.lit(": trailing bands would hash empty slices shared "
                  "by every doc")))
    band_entries = F.array(*[
        F.struct(F.lit(j).alias("band_idx"),
                 (F.coalesce(sig_len_ok.cast("long"),
                             F.xxhash64(F.slice(
                                 F.col(sig_col), j * rows_per_band + 1,
                                 rows_per_band)))
                  if j == 0 else
                  F.xxhash64(F.slice(F.col(sig_col),
                                     j * rows_per_band + 1,
                                     rows_per_band))).alias("band_hash"))
        for j in range(bands)
    ])
    exploded = (sig_df.select(F.col(id_col), F.explode(band_entries).alias("b"))
                .select(id_col, "b.band_idx", "b.band_hash"))
    # read 2× (self-join sides) + 1× for the hot-bucket count — persist
    # so the signature computation upstream runs once, not three times
    # (3 longs per band entry; tiny next to the shingle arrays)
    from pyspark.storagelevel import StorageLevel
    exploded = exploded.persist(StorageLevel.MEMORY_AND_DISK)
    if max_bucket_size is not None:
        hot = (exploded.groupBy("band_idx", "band_hash")
               .agg(F.count(F.lit(1)).alias("_n"))
               .where(F.col("_n") > max_bucket_size)
               .select("band_idx", "band_hash"))
        exploded = exploded.join(F.broadcast(hot),
                                 ["band_idx", "band_hash"], "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (a.join(b, ["band_idx", "band_hash"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays, in DOUBLE.

    NULL on either side yields NULL (no similarity is defined for a
    missing set) — the guard is explicit because under a non-ANSI
    session ``size(NULL)`` is -1, which made two NULL arrays score
    -1/-1 = 1.0: every pair of NULL-text documents read as a PERFECT
    duplicate and all but one were deleted downstream (r15 review,
    verified live; ``union == 0`` never fired because union was -1)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(a.isNull() | b.isNull(),
                  F.lit(None).cast("double")) \
        .when(union == 0, F.lit(0.0)).otherwise(inter / union)


def near_dup_minhash(df: DataFrame, id_col: str, text_col: str,
                     threshold: float = 0.8, n: int = 3, k: int = 32,
                     bands: int = 8, rows_per_band: int = 4,
                     persist: bool = True) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard verified.

    Returns (id_a, id_b, jaccard) with jaccard >= threshold.  LSH keeps
    the candidate set near-linear; the final verify join only touches
    candidate ids, so the shingle arrays are re-joined — not carried
    through the band shuffle (they'd bloat the shuffle at scale).

    ``persist`` caches the shingle relation (read 3×: signature build +
    both sides of the verify join) with MEMORY_AND_DISK.  The cache is
    left for LRU eviction (the returned frame is lazy, so eager
    unpersist would defeat it); a driver looping many corpora should
    ``spark.catalog.clearCache()`` between runs.  At cluster scale pass
    False to trade recomputation for memory, or persist the tokenized
    corpus upstream yourself.
    """
    if bands * rows_per_band > k:
        raise ValueError(
            f"bands×rows_per_band = {bands * rows_per_band} exceeds the "
            f"signature length k={k}: the trailing bands would hash "
            "empty slices (shared by every doc) and silently contribute "
            "zero recall — or an all-pairs join in uncapped audit mode")
    # NO narrow-input spread here, deliberately (r17 adjudication,
    # re-confirming r16's "explicit width unnecessary"): the pair fold
    # downstream is a SortMergeJoin whose (band_idx, band_hash)
    # exchanges spread it cluster-wide by construction (pinned in
    # tests/test_dedup.py), and a paired A/B of a corpus spread before
    # this Arrow pipeline measured no wall change (8 alternating reps,
    # medians within noise) — AQE races the downstream query stages
    # concurrently, so the six 1-task upstream recomputations already
    # overlap into one task-length wall either way.
    base = df.select(F.col(id_col).alias("_id"),
                     shingles_batched(F.col(text_col), n).alias("sh"))
    if persist:
        from pyspark.storagelevel import StorageLevel
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = base.select("_id", minhash_signature_batched(
        shingle_bases(F.col("sh")), k).alias("sig"))
    cand = lsh_candidate_pairs(sigs, "_id", "sig", bands, rows_per_band)
    sh_a = base.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (cand.join(sh_a, "id_a").join(sh_b, "id_b")
            .select("id_a", "id_b",
                    round4(jaccard(F.col("sh_a"), F.col("sh_b")))
                    .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


# ----------------------------------------------------- exact ngram jaccard

def _shingle_overlap_counts(df: DataFrame, id_col: str, text_col: str,
                            block_col: str, n: int,
                            max_shingle_df: int | None) -> DataFrame:
    """Shared inverted-shingle-index body of :func:`ngram_jaccard_pairs`
    and :func:`containment_pairs`: explode (block, shingle, id),
    self-join on the shingle, count co-occurrences per pair.  Returns
    the grouped pair relation ``(id_a, id_b, sz_a, sz_b, inter)`` with
    ``inter = |A∩B| >= 1``; the callers differ only in the score they
    derive from it.  ``max_shingle_df`` drops shingles shared by more
    than that many docs in a block (broadcast anti-join on the tiny
    stop-shingle list) — the hot-key guard for the m²/2 join term."""
    base = df.select(F.col(block_col).alias("_blk"),
                     F.col(id_col).alias("_id"),
                     shingles_batched(F.col(text_col), n).alias("sh"))
    ex = base.select("_blk", "_id", F.size("sh").alias("sz"),
                     F.explode("sh").alias("s"))
    # spread the per-shingle pair fold across the cluster: the corpus
    # is byte-small, so the self-join plans as a BroadcastHashJoin
    # whose STREAM side runs directly on the scan's 1-2 input
    # partitions — but the join EXPLODES m²/2 rows per shingle, CPU
    # volume that byte-based split sizing cannot see, so the whole
    # fold (join + map-side pair agg) ran on 2 of 32 cores (r16
    # measured the pair family 5-17× slower from this alone, and
    # wildly load-sensitive).  Hash spread on the join key (shingles
    # are high-cardinality, so the exchange is join-reusable); no-op
    # on already-wide inputs (functions/partitioning.py).  Pure
    # relocation: every pair and every count is unchanged.  The
    # spread sits BEFORE the hot-shingle anti-join: probing the
    # post-join plan materialized its broadcast (the hot aggregate
    # ran twice per call — r16 ADVICE), while here the probed plan is
    # scan-only; the broadcast anti-join preserves the stream side's
    # (_blk, s) partitioning, and the hot aggregate itself now reuses
    # the exchange instead of shuffling again.
    from ..functions.partitioning import spread_if_narrow
    ex = spread_if_narrow(ex, "_blk", "s")
    if max_shingle_df is not None:
        hot = (ex.groupBy("_blk", "s")
               .agg(F.count(F.lit(1)).alias("_n"))
               .where(F.col("_n") > max_shingle_df)
               .select("_blk", "s"))
        ex = ex.join(F.broadcast(hot), ["_blk", "s"], "left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    return (a.join(b, ["_blk", "s"])
            .where(F.col("a._id") < F.col("b._id"))
            .groupBy(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"),
                     F.col("a.sz").alias("sz_a"),
                     F.col("b.sz").alias("sz_b"))
            .agg(F.count(F.lit(1)).alias("inter")))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        block_col: str, threshold: float = 0.4,
                        n: int = 3,
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact pairwise Jaccard inside a blocking key (the oracle-checkable
    baseline), via an **inverted shingle index**: explode (block,
    shingle, id), self-join on the shingle, count co-occurrences per
    pair — |A∩B| — then |A∪B| = |A|+|B|−|A∩B|.  Exact for any
    ``threshold > 0`` because a pair sharing zero shingles has jaccard
    0 and cannot pass the filter; measured ~20× faster than the naive
    per-pair ``array_intersect`` quadratic at sf0.1 (the join only
    materializes pairs that actually overlap).

    Scale caveat: a shingle shared by m docs in a block contributes
    m²/2 join rows — corpus-frequent shingles are the hot keys.
    ``max_shingle_df`` is the standard mitigation: drop shingles shared
    by more than that many docs in a block (a broadcast anti-join on
    the tiny stop-shingle list, same guard shape as the LSH hot-bucket
    caps).  This makes the result an UNDER-approximation — stop-shingle
    overlap no longer counts toward the intersection, while |A| and |B|
    still do — so jaccard values can only shrink: no false positives
    enter, borderline pairs may drop.  Leave None (exact) for audits;
    at 100 TB prefer :func:`near_dup_minhash` (banded + capped)."""
    if threshold <= 0:
        raise ValueError(
            "threshold must be > 0: zero-overlap pairs are pruned by "
            "construction in the inverted-index formulation")
    pairs = _shingle_overlap_counts(df, id_col, text_col, block_col, n,
                                    max_shingle_df)
    # union >= inter >= 1 for every grouped pair, so the division is
    # ANSI-safe; small-int ratio → identical IEEE doubles in DuckDB
    union = (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
    return (pairs.select("id_a", "id_b",
                         round4(F.col("inter").cast("double") / union)
                         .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      block_col: str, threshold: float = 0.8,
                      n: int = 3,
                      max_shingle_df: int | None = None) -> DataFrame:
    """Shingle-containment pairs inside a blocking key:
    ``containment = |A∩B| / min(|A|, |B|)`` — near 1.0 when one
    document's shingle set is (almost) a SUBSET of the other's.

    Jaccard misses sub-document duplication: a paragraph pasted into a
    10× longer page scores ``|A|/|B| ≈ 0.1`` jaccard but ~1.0
    containment.  This is the standard screen for quote/boilerplate
    inclusion and truncated re-crawls in training corpora (the min
    makes it symmetric; use the smaller side's coverage).

    Same inverted-shingle-index shape (and the same exactness and
    ``max_shingle_df`` under-approximation caveats) as
    :func:`ngram_jaccard_pairs`.  Returns
    ``(id_a, id_b, sz_a, sz_b, containment)``.
    """
    if threshold <= 0:
        raise ValueError(
            "threshold must be > 0: zero-overlap pairs are pruned by "
            "construction in the inverted-index formulation")
    pairs = _shingle_overlap_counts(df, id_col, text_col, block_col, n,
                                    max_shingle_df)
    denom = F.least(F.col("sz_a"), F.col("sz_b")).cast("double")
    return (pairs.select("id_a", "id_b", "sz_a", "sz_b",
                         round4(F.col("inter").cast("double") / denom)
                         .alias("containment"))
            .where(F.col("containment") >= threshold))


def decontaminate(corpus: DataFrame, benchmark: DataFrame, id_col: str,
                  text_col: str, bench_text_col: str | None = None,
                  n: int = 5) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing at least one
    n-token shingle with an evaluation/benchmark set (the standard
    n-gram-overlap contamination check used before training-data
    release; n of 5-13 in practice — higher n → fewer false positives).

    Returns ``(id_col, n_hits)`` — contaminated docs and how many
    DISTINCT shingles they share with the benchmark (shingles are
    per-doc distinct by construction).

    Scale shape: benchmark sets are small (thousands of questions), so
    the distinct benchmark-shingle relation is explicitly broadcast —
    the corpus side is a map-only explode + broadcast-hash semi-match,
    and the only shuffle is the final hash-agg on doc id.  A 100 TB
    corpus streams through without ever shuffling its shingles.
    """
    bench_col = bench_text_col or text_col
    bench_grams = (benchmark
                   .select(F.explode(shingles_batched(F.col(bench_col), n))
                           .alias("_g"))
                   .distinct())
    corpus_grams = corpus.select(F.col(id_col),
                                 F.explode(shingles_batched(F.col(text_col), n))
                                 .alias("_g"))
    return (corpus_grams
            .join(F.broadcast(bench_grams), "_g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))


# ---------------------------------------------------------------- simhash

def _spread_stream(df: DataFrame) -> DataFrame:
    """Round-robin the STREAM side of a broadcast pair join across the
    cluster: blocked self-joins on byte-small relations plan as a
    BroadcastHashJoin whose stream side runs on the source scan's 1-2
    partitions while the join explodes m²/2 rows per block — CPU
    volume byte-based split sizing cannot see (the r16 collapse
    family).  A broadcast join needs no particular stream
    partitioning, so this is pure relocation; use it where the block
    key has too few distinct values for a hash spread.  No-op when
    the relation is already planned at cluster width (r16 review —
    the spread must never add a shuffle on wide inputs)."""
    from ..functions.partitioning import spread_if_narrow
    return spread_if_narrow(df)


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  block_col: str, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash32) <= max_hamming inside a
    blocking key.  Signatures come from the Arrow-batched simhash (bit-
    identical to the Column spec form); ``bit_count(xor)`` pairing stays
    in codegen."""
    base = df.select(F.col(block_col).alias("_blk"),
                     F.col(id_col).alias("_id"),
                     simhash_batched(F.col(text_col)).alias("sh"))
    # the block key has FEW distinct values (a language column), so a
    # hash repartition cannot spread the m²/2 hamming fold — round-
    # robin the stream side (_spread_stream; pairs unchanged).  Side b
    # carries an explicit broadcast hint: the spread only works while
    # the planner streams side a, and with two identical-size sides
    # that was a tie-break the committed plan fixtures pinned but a
    # stats/version change could flip, silently running the fold on
    # side b's 1-2 scan partitions again (r16 ADVICE).
    a = _spread_stream(base).alias("a")
    b = F.broadcast(base).alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (a.join(b, "_blk")
            .where(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


def incremental_dedup(new_df: DataFrame, seen_df: DataFrame,
                      key: Column, id_col: str,
                      seen_key_col: str = "fingerprint") -> DataFrame:
    """Ingest-time dedup of a NEW batch against the historical corpus:
    drop rows whose dedup key already exists in ``seen_df`` (the
    persisted fingerprint table), then drop intra-batch duplicates
    (keep-lowest-id).

    The production loop: fingerprints of every accepted batch are
    appended to the fingerprint table via the partitioned sink, so
    ``seen_df`` stays a compact (fingerprint)-only relation — the
    anti-join shuffles fingerprints, never documents, and at 100 TB the
    fingerprint table is the thing you bucket
    (:func:`~.partitioned_write.write_bucketed`) so repeated ingests
    join with zero exchange on the history side.
    """
    from pyspark.sql import Window

    # collision-checked temp names: a caller's own "_fp"/"_rn" column
    # was silently clobbered by withColumn and then dropped from the
    # output — a row-dropping operator must never lose a column (r15
    # review)
    fp, rn = "_fp", "_rn"
    while fp in new_df.columns:
        fp += "_"
    while rn in new_df.columns or rn == fp:
        rn += "_"
    keyed = new_df.withColumn(fp, key)
    # a NULL fingerprint (e.g. NULL text) identifies nothing — those
    # rows pass through UNDEDUPED rather than silently vanishing in
    # the null-unsafe joins below (ex-review finding)
    null_fp = keyed.where(F.col(fp).isNull()).drop(fp)
    fresh = (keyed.where(F.col(fp).isNotNull())
             .join(seen_df.select(F.col(seen_key_col).alias(fp))
                   .distinct(),
                   fp, "left_anti"))
    # window rank, not a groupBy+self-join: one shuffle instead of two,
    # and exact re-delivered duplicates (same fingerprint AND id) keep
    # exactly one copy instead of both surviving an equality join
    w = Window.partitionBy(fp).orderBy(id_col)
    kept = (fresh.withColumn(rn, F.row_number().over(w))
            .where(F.col(rn) == 1).drop(rn, fp))
    return kept.unionByName(null_fp)


# ----------------------------------------------------- cluster resolution

def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b", max_iter: int = 25,
                   driver_threshold: int = 100_000) -> DataFrame:
    """Near-dup pairs → duplicate CLUSTERS: connected components with
    the min doc id as the cluster representative — the step that turns
    any pair-producing dedup op (MinHash, SimHash, embedding, n-gram)
    into a keep-one-per-group decision.

    Distributed min-label propagation: every node starts labeled with
    itself; each round takes the min of its own and its neighbors'
    labels (join + hash-agg = 2 shuffles per round) until a round
    changes nothing.  The node's previous label rides through the same
    aggregate, so convergence detection is a filter-count over the
    just-checkpointed round output — no extra join per round.  Rounds
    needed = graph diameter; duplicate clusters are near-cliques
    (diameter ~2-3), so this converges in a handful of rounds — for
    long-chain graphs switch to the large-star/small-star contraction.
    ``localCheckpoint`` cuts the iterative lineage (at cluster scale,
    point ``spark.sparkContext.setCheckpointDir`` at durable storage
    and use ``checkpoint``).

    Returns (doc_id, cluster_id) for every doc appearing in a pair;
    unpaired docs are their own implicit singleton clusters.

    Pair graphs are pairs-sized, not corpus-sized — after a good
    screen they are usually tiny even when the corpus is 100 TB.  When
    the pair count is at most ``driver_threshold`` (probed with a
    bounded ``limit(t+1).count()``, never a full count), components
    are resolved with a driver-side union-find instead of paying
    2 shuffles + a checkpoint per propagation round; the output is
    identical (same components, same min-id labels — the clusters
    oracle hash-checks both paths).  Pass 0 to force the distributed
    loop.
    """
    # a pair with a NULL member is meaningless — drop uniformly so both
    # resolution paths see identical input
    pairs = pairs.where(F.col(id_a).isNotNull() & F.col(id_b).isNotNull())
    persisted = None
    id_dt = pairs.schema[id_a].dataType.simpleString()
    if driver_threshold and (
            id_dt == pairs.schema[id_b].dataType.simpleString()):
        # the probe, the collect (or the distributed loop's checkpoint)
        # all read the possibly-expensive upstream pair pipeline —
        # persist so it computes once
        from pyspark.storagelevel import StorageLevel
        persisted = pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        probe = pairs.limit(driver_threshold + 1).count()
        if probe <= driver_threshold:
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:       # path compression
                    parent[x], x = r, parent[x]
                return r

            try:
                for row in pairs.select(id_a, id_b).collect():
                    u, v = row[0], row[1]
                    parent.setdefault(u, u)
                    parent.setdefault(v, v)
                    ru, rv = find(u), find(v)
                    if ru != rv:
                        parent[ru] = rv
            finally:
                persisted.unpersist()
            label: dict = {}
            for node in parent:
                r = find(node)
                if r not in label or node < label[r]:
                    label[r] = node
            rows = [(node, label[find(node)]) for node in parent]
            return pairs.sparkSession.createDataFrame(
                rows, f"doc_id {id_dt}, cluster_id {id_dt}")
    edges = checkpoint_df(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionByName(pairs.select(F.col(id_b).alias("u"),
                                  F.col(id_a).alias("v"))))
    # ^ materialized once: every iteration joins against edges, and
    # without the cut each round would recompute the (possibly
    # expensive) upstream pair pipeline
    if persisted is not None:       # checkpoint holds the data now
        persisted.unpersist()
    labels = (edges.select("u").distinct()
              .select(F.col("u").alias("node"), F.col("u").alias("label")))
    changed = -1          # max_iter=0: for-else must not read unbound
    for _ in range(max_iter):
        neigh = (edges.join(labels, edges.v == labels.node)
                 .select(F.col("u").alias("node"), "label",
                         F.lit(False).alias("_own")))
        own = labels.select("node", "label", F.lit(True).alias("_own"))
        # carry the node's previous label through the same aggregate
        # (every node has exactly one _own row), so convergence
        # detection below is a scan of the checkpointed result — no
        # extra join per round
        new_labels = (own.unionByName(neigh)
                      .groupBy("node")
                      .agg(F.min("label").alias("label"),
                           F.max(F.when(F.col("_own"), F.col("label")))
                           .alias("_old")))
        new_labels = checkpoint_df(new_labels)
        changed = new_labels.where(
            F.col("label") != F.col("_old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"label propagation did not converge within max_iter="
            f"{max_iter} rounds "
            f"({'no round ran' if changed < 0 else changed} "
            "labels still changing) — "
            "the pair graph has a longer chain than expected; raise "
            "max_iter or switch to star contraction")
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def apply_dedup(corpus: DataFrame, pairs: DataFrame, id_col: str,
                id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """APPLY a dedup decision end-to-end: near-dup ``pairs`` →
    connected-component clusters (:func:`dedup_clusters`) → keep only
    each cluster's min-id representative — the step that turns any
    pair-producing screen into the actual cleaned corpus.

    Non-representative members are removed via one broadcast-friendly
    anti-join on the (pairs-sized, tiny next to the corpus) drop list;
    docs never appearing in a pair pass through untouched.  Preserves
    the corpus schema.
    """
    clusters = dedup_clusters(pairs, id_a, id_b)
    drop = (clusters.where(F.col("doc_id") != F.col("cluster_id"))
            .select(F.col("doc_id").alias(id_col)))
    return corpus.join(drop, id_col, "left_anti")


# ------------------------------------------------------------- embeddings

# floor of the internal executor-memory ceiling applied when
# ``max_bucket_size=None`` (exhaustive-verify mode): a bucket's full
# vector matrix lives in ONE in-bucket worker (~50 MB at 100k x dim 64
# float64), so "unbounded" relaxes but never removes the bound; the
# over-cap drop WARNS loudly (r10 ADVICE #2).  Module-level so tests
# can pin the warning without building a 100k-entry bucket.
_UNBOUNDED_VERIFY_CEILING_FLOOR = 100_000


def embedding_near_dup_lsh(df: DataFrame, id_col: str, vec_col: str,
                           threshold: float = 0.9,
                           dim: int | None = 64,
                           n_planes: int | None = None, n_tables: int = 4,
                           seed: int = 42,
                           max_bucket_size: int | None = 10_000,
                           target_bucket_size: int = 128) -> DataFrame:
    """Label-free embedding near-dup: sign-LSH buckets ARE the blocking
    key (no pre-existing cluster/label column needed — the realistic
    100 TB case).  Vectors near a hyperplane can land in different
    buckets in one table — n_tables independent tables amplify recall
    exactly like the MinHash bands.

    Scale shape (mirrors :func:`lsh_candidate_pairs` + re-join verify):

    * ``n_planes=None`` derives the bucket count from the corpus size
      (buckets ≈ n / target_bucket_size, clamped to [2, 16] planes), so
      the per-bucket quadratic term stays ~n·target/2 per table instead
      of n²/2^planes with a FIXED plane count — the latter degenerates
      to all-pairs as the corpus grows past 2^planes·target.
    * ``max_bucket_size`` drops degenerate buckets (e.g. a zero-vector
      pile-up: every zero vector lands in bucket 0 of every table) via
      a broadcast anti-join on the tiny hot-bucket list, same guard as
      the MinHash band path.  Since the in-bucket verify materializes
      a whole bucket's vectors in ONE Python worker (the join-based
      verify streamed pairs; this one does not), the guard doubles as
      the executor-memory bound — so None no longer disables it
      outright (r9 review): an internal ceiling of
      ``max(100_000, 64 * target_bucket_size)`` still applies, keeping
      a degenerate bucket's in-worker matrix bounded (~50 MB at
      dim 64) while admitting any realistic bucket.
    * the verify runs IN-BUCKET (``applyInPandas`` per (table,
      bucket)): each bucket entry ships its vector ONCE — n·tables
      rows of (id, vec) — and pairs score inside the group with the
      same per-row float64 einsum/norm arithmetic as
      ``cosine_batched`` (bit-identical, so the certification key's
      tol=0 recompute still matches).  The r9 sf10 spot-run showed
      why: materializing candidate pairs and joining both vectors
      onto them shuffles pairs x 2 x dim floats (~55 GB at 200k
      vectors / 100M candidates, slope 1.40); in-bucket verify
      shuffles ~0.4 GB and only SURVIVING pairs leave the group
      (the distinct dedupes the <= n_tables copies of each
      survivor).  Slab-chunked pair generation bounds group memory
      at ~500k pairs however large a bucket the cap admits.
    """
    import math as _math

    import numpy as _np
    import pandas as _pd

    from pyspark.storagelevel import StorageLevel

    from .similarity import _all_buckets_udf

    # NULL ids break the in-bucket object-array min/max pairing the
    # same way they break the matmul twin (which guards them) — drop
    # them up front (r13 review)
    df = df.where(F.col(id_col).isNotNull())
    if dim is None:
        # derive from the id-ordered first non-null vector (same
        # deterministic probe semantic_dedup uses)
        row = (df.where(F.col(vec_col).isNotNull())
               .select(F.size(F.col(vec_col)).alias("_d"))
               .orderBy(id_col).first())
        if row is None:
            id_dt0 = df.schema[id_col].dataType.simpleString()
            return df.sparkSession.createDataFrame(
                [], f"id_a {id_dt0}, id_b {id_dt0}, cos_sim double")
        dim = int(row["_d"])
    if n_planes is None:
        n = df.count()
        n_planes = min(16, max(2, _math.ceil(
            _math.log2(max(n / target_bucket_size, 2.0)))))

    budf = _all_buckets_udf(dim, n_planes, n_tables, seed)
    id_t = df.schema[id_col].dataType.simpleString()
    entries = (df.select(F.col(id_col).alias("_id"),
                         F.col(vec_col).alias("v"))
               .select("_id", "v",
                       F.posexplode(budf(F.col("v"))).alias("tbl", "bucket"))
               # read by the hot-bucket count + the verify pass —
               # persist so the Arrow bucket UDF runs once per corpus
               .persist(StorageLevel.MEMORY_AND_DISK))
    if not entries.take(1) and df.take(1):
        # a wrong `dim` NULL-buckets every vector and the result is a
        # silently empty pair set, indistinguishable from "no
        # duplicates" (r13 review) — fail loudly instead
        probe = (df.where(F.col(vec_col).isNotNull())
                 .select(F.size(F.col(vec_col)).alias("_d")).take(1))
        if not probe:
            # every vector is NULL: nothing to compare, which is an
            # empty RESULT, not a dim error — matching the dim=None
            # path, which returns the empty typed pair frame for the
            # same corpus (r13 advice: the two paths diverged in
            # loudness on this input)
            return df.sparkSession.createDataFrame(
                [], f"id_a {id_t}, id_b {id_t}, cos_sim double")
        raise ValueError(
            f"embedding_near_dup_lsh: every vector failed the "
            f"dim={dim} check (first non-null vector has "
            f"{probe[0]['_d']} elements) — pass dim=None to derive "
            f"it from the corpus")
    # None relaxes but never removes the bound: the verify holds a
    # bucket's full vector matrix in one worker, so an uncapped
    # degenerate bucket (zero-vector pile-up) could OOM an executor
    cap = (max_bucket_size if max_bucket_size is not None
           else max(_UNBOUNDED_VERIFY_CEILING_FLOOR,
                    64 * target_bucket_size))
    hot = (entries.groupBy("tbl", "bucket")
           .agg(F.count(F.lit(1)).alias("_n"))
           .where(F.col("_n") > cap)
           .select("tbl", "bucket"))
    if max_bucket_size is None:
        # the caller asked for exhaustive verification — the internal
        # executor-memory ceiling still applies (an uncapped degenerate
        # bucket OOMs the in-bucket worker), but it must never cut
        # recall SILENTLY (r10 ADVICE #2).  Bounded probe: the hot list
        # is over-cap buckets only, so collecting a handful is cheap,
        # and the agg it runs is the same one the anti-join needs over
        # the persisted entries.
        sample = hot.limit(20).collect()
        if sample:
            import warnings
            warnings.warn(
                f"embedding_near_dup_lsh(max_bucket_size=None): "
                f"{len(sample)}{'+' if len(sample) == 20 else ''} "
                f"bucket(s) exceed the internal executor-memory "
                f"ceiling ({cap} entries); their pairs are DROPPED "
                f"and recall is reduced, e.g. (tbl, bucket) = "
                f"{[(r.tbl, r.bucket) for r in sample[:5]]}. Raise "
                f"target_bucket_size or pre-filter degenerate vectors "
                f"(zero-vector pile-ups).", RuntimeWarning,
                stacklevel=2)
    entries = entries.join(F.broadcast(hot), ["tbl", "bucket"],
                           "left_anti")
    thr = float(threshold)

    def _verify(pdf: _pd.DataFrame) -> _pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        nb = len(ids)
        empty = _pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0],
                               "cos_sim": _np.array([], dtype=_np.float64)})
        if nb < 2:
            return empty
        mat = _np.asarray(pdf["v"].tolist(), dtype=_np.float64)
        norms = _np.linalg.norm(mat, axis=1)
        out = []
        # slab over the i side so pair arrays stay ~500k rows
        slab = max(1, 500_000 // nb)
        for lo in range(0, nb - 1, slab):
            hi = min(lo + slab, nb - 1)
            ia, ib = [], []
            for i in range(lo, hi):
                ia.append(_np.full(nb - i - 1, i))
                ib.append(_np.arange(i + 1, nb))
            ia = _np.concatenate(ia)
            ib = _np.concatenate(ib)
            # same per-row kernel as functions.vectors.cosine_batched:
            # float64 gather, einsum row dot, norm product — per-pair
            # bits independent of batch composition, and orientation-
            # independent (elementwise mul + same row reduction)
            num = _np.einsum("ij,ij->i", mat[ia], mat[ib])
            den = norms[ia] * norms[ib]
            with _np.errstate(divide="ignore", invalid="ignore"):
                cos = _np.where(den > 0, num / den, _np.nan)
            cos = _np.floor(cos * 10000 + 0.5) / 10000  # round4 twin
            keep = ~_np.isnan(cos) & (cos >= thr)
            if keep.any():
                ka, kb = ia[keep], ib[keep]
                # two ROWS sharing one id value (exact-duplicate input)
                # would emit a (x, x) self-pair the a._id < b._id join
                # form excludes — the matmul twin guards this too (r13
                # review)
                neq = ids[ka] != ids[kb]
                ka, kb, kcos = ka[neq], kb[neq], cos[keep][neq]
                if len(ka):
                    out.append(_pd.DataFrame({
                        "id_a": _np.minimum(ids[ka], ids[kb]),
                        "id_b": _np.maximum(ids[ka], ids[kb]),
                        "cos_sim": kcos}))
        return _pd.concat(out) if out else empty

    pairs = entries.groupBy("tbl", "bucket").applyInPandas(
        _verify, f"id_a {id_t}, id_b {id_t}, cos_sim double")
    # a pair colliding in several tables emits bit-identical rows
    # (same kernel, same inputs) — distinct on the SURVIVORS is tiny
    return pairs.distinct()


def embedding_near_dup(df: DataFrame, id_col: str, vec_col: str,
                       block_col: str, threshold: float = 0.95,
                       batched: bool = False) -> DataFrame:
    """Cosine near-duplicate pairs inside a blocking key (e.g. a cluster
    or LSH bucket assignment).  Blocking bounds the quadratic term; the
    L2 norm is computed once per ROW before the join (not per pair), so
    each pair costs one dot product.

    ``batched=False`` (default) scores pairs with the Column
    ``aggregate``/``zip_with`` expression — sequential-sum order, the
    exact twin of the DuckDB oracle's ``list_cosine_similarity``, which
    the hash-checked `dedup_embedding` key requires.  ``batched=True``
    scores with the Arrow numpy pass (~5× faster; SIMD summation order
    can differ from sequential in the last float bits) — the right
    choice for rows-only callers like :func:`semantic_dedup` whose
    verification is a threshold, not a value hash."""
    from ..functions.vectors import cosine_batched

    # side b broadcast-hinted for the same reason as simhash_pairs:
    # the spread is only effective while side a streams, and the
    # identical-size tie-break must not depend on planner stats (r16
    # ADVICE)
    if batched:
        base = df.select(F.col(block_col).alias("_blk"),
                         F.col(id_col).alias("_id"),
                         F.col(vec_col).alias("v"))
        a = _spread_stream(base).alias("a")
        b = F.broadcast(base).alias("b")
        cos = cosine_batched(F.col("a.v"), F.col("b.v"))
    else:
        base = df.select(F.col(block_col).alias("_blk"),
                         F.col(id_col).alias("_id"),
                         F.col(vec_col).alias("v"),
                         l2_norm(F.col(vec_col)).alias("nrm"))
        a = _spread_stream(base).alias("a")
        b = F.broadcast(base).alias("b")
        cos = F.try_divide(dot(F.col("a.v"), F.col("b.v")),
                           F.col("a.nrm") * F.col("b.nrm"))
    return (a.join(b, "_blk")
            .where(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    round4(cos).alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str,
                        k: int = 4, w: int = 4) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    the MOSS algorithm): hash every word ``k``-gram, slide a window of
    ``w`` consecutive gram hashes, keep each window's minimum — the
    guarantee is that any match of ``w + k - 1`` tokens or longer
    shares at least one selected fingerprint, so partial overlap
    (quotes, template reuse, plagiarised spans) is detectable from a
    set ~``1/w`` the size of the full gram set.

    Returns DISTINCT ``(id, fp)`` rows.  The gram hash is the portable
    md5-60-bit integer (``sampling.hash_unit``'s construction), so the
    DuckDB oracle computes identical fingerprints.  Docs with fewer
    than ``k + w - 1`` tokens yield no complete window and are absent —
    in both engines.

    Shape: one explode (gram grain), a per-document ordered window
    min (the same single shuffle any per-doc op needs), then a
    distinct on the ~n/w selected hashes.  All JVM expressions inside
    codegen — the gram construction reuses the Arrow-batched path.
    """
    from pyspark.sql import Window

    # NULL document ids are excluded (the _span_relation rule): every
    # NULL-id doc's fingerprints would otherwise merge under one NULL
    # id surviving the final distinct, then vanish in downstream
    # null-unsafe joins (r15 review)
    ex = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.posexplode(ngrams_all_batched(F.col(text_col), k))
        .alias("_pos", "_g"))
    h = F.conv(F.substring(F.md5(F.col("_g")), 1, 15), 16, 10) \
         .cast("bigint")
    win = (Window.partitionBy("_id").orderBy("_pos")
           .rowsBetween(Window.currentRow, w - 1))
    scored = ex.select(
        "_id", "_pos",
        F.min(h).over(win).alias("_minh"),
        F.count(F.lit(1)).over(win).alias("_wn"))
    return (scored.where(F.col("_wn") == w)
            .select(F.col("_id").alias(id_col),
                    F.col("_minh").alias("fp"))
            .distinct())


def _blocked_cosine_pairs_matmul(blocked: DataFrame, id_col: str,
                                 vec_col: str, block_col: str,
                                 threshold: float,
                                 chunk: int = 1024) -> DataFrame:
    """Within-block cosine pairs via one BLAS matmul per block
    (``applyInPandas``): each block ships its vectors through Arrow
    ONCE (n·dim floats) instead of duplicating both vectors onto every
    candidate pair (n²·dim — the per-pair join shape moves ~n/2× more
    data and evaluates interpreted).  Pairs are thresholded before
    leaving Python, so only true near-dups hit the JVM.  Row-chunked
    so a block at the ``max_cluster_size`` cap peaks at
    ``chunk × n`` doubles, not ``n × n``.  Same rounding
    (floor(x·1e4+0.5)/1e4) and (id_a < id_b) contract as
    :func:`embedding_near_dup`."""
    id_dt = blocked.schema[id_col].dataType.simpleString()

    def pairs_of(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="object"),
                              "id_b": pd.Series([], dtype="object"),
                              "cos_sim": pd.Series([], dtype="float64")})
        # NULL / ragged vectors score NULL cosine in the expression
        # path and get threshold-filtered — drop them here for parity
        vecs = pdf[vec_col]
        dim = next((len(v) for v in vecs if v is not None), 0)
        ok = vecs.map(lambda v: v is not None and len(v) == dim)
        # NULL ids break the object-array min/max pairing — drop them
        # like the expression twin's null-unsafe comparisons would
        ok = ok & pdf[id_col].map(lambda x: x is not None)
        pdf = pdf[ok]
        ids = pdf[id_col].to_numpy()
        if len(ids) < 2:
            return empty
        X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        nrm = np.sqrt((X * X).sum(1))
        nrm[nrm == 0] = np.inf          # zero vectors match nothing
        Xn = X / nrm[:, None]
        out_a, out_b, out_s = [], [], []
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            S = Xn[lo:hi] @ Xn.T        # (chunk, n)
            S = np.floor(S * 10000 + 0.5) / 10000
            ii, jj = np.nonzero(S >= threshold)
            keep = (ii + lo) < jj       # upper triangle, no self
            li, gj = ii[keep], jj[keep]
            # duplicate id VALUES in one block would otherwise emit
            # (x, x) self-pairs the a._id < b._id twin excludes
            neq = ids[li + lo] != ids[gj]
            li, gj = li[neq], gj[neq]
            # np.minimum/maximum work elementwise on object id arrays
            # too (strings, etc.), so the caller's id type survives
            out_a.append(np.minimum(ids[li + lo], ids[gj]))
            out_b.append(np.maximum(ids[li + lo], ids[gj]))
            out_s.append(S[li, gj])
        if not out_a:
            return empty
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "cos_sim": np.concatenate(out_s)})

    return (blocked.select(F.col(block_col), F.col(id_col).alias(id_col),
                           F.col(vec_col))
            .groupBy(block_col)
            .applyInPandas(
                pairs_of,
                f"id_a {id_dt}, id_b {id_dt}, cos_sim double"))


#: flat-codebook list-count clamp: past this the driver-side Lloyd
#: sample stops scaling and assignment cost O(n·n_lists) dominates, so
#: semantic_dedup switches to the two-level quantizer (module-level so
#: tests can lower it to exercise the switch on a small corpus)
_FLAT_LIST_CLAMP = 4096


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str,
                   threshold: float = 0.9, n_lists: int | None = None,
                   nprobe: int = 2, extra_probes: int = 1,
                   max_cluster_size: int | None = 10_000,
                   target_cluster_size: int = 256,
                   dim: int | None = None, sub_tables: int = 2,
                   seed: int = 777) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al., *SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication*, arXiv 2303.09540): k-means clusters are the
    blocking key, cosine pairs are found WITHIN each cluster — the
    label-free embedding dedup whose block count scales with the data
    (vs the fixed 2^planes of sign-LSH).

    ``nprobe > 1`` assigns each vector to its several nearest
    centroids (multi-assignment), recovering near-dup pairs that
    straddle a cluster boundary — the same recall lever as LSH's
    multi-table amplification.

    ``extra_probes`` adds that many probes ON TOP of ``nprobe`` when
    the two-level quantizer is active (it compensates the staged
    coarse-then-fine search's extra boundary loss; the flat path
    probes exactly ``nprobe`` lists).  Probed lists are nearest-k, so
    a larger ``extra_probes`` probes a superset of lists and — while
    ``max_cluster_size`` is not binding — the pair set grows
    monotonically (with the cap binding, extra probes can push a
    block OVER the cap and into subdivision, whose undivisible
    residue is dropped; the cap warning names the dropped blocks).
    Measured at 200k vectors / threshold
    0.62 vs flat's 117 pairs in 27s (SCALING.md quantizer section):

    ========================  =======  ==========
    two-level setting         pairs    wall (s)
    ========================  =======  ==========
    nprobe=2 (extra=0)        77       ~7
    nprobe=2 + extra=1        111      ~9.7
    ========================  =======  ==========

    The default (1) is the cheap side of that trade; raise it toward
    2-3 only when boundary recall matters more than the ~linear
    probe-count cost in the in-block verify.

    Scale shape — the two knobs that keep the per-block quadratic
    bounded as the corpus grows (same pattern as
    :func:`embedding_near_dup_lsh`'s auto-planes + bucket cap):

    * ``n_lists=None`` derives the cluster count from the corpus size
      (``≈ n / target_cluster_size``, clamped to [8, 4096]), so the
      expected per-cluster quadratic stays ~n·target/2 instead of
      n²/n_lists with a FIXED list count — the latter degenerates to
      all-pairs as the corpus grows past n_lists·target.  The 4096
      clamp bounds the driver-side Lloyd training (the sample scales
      as 2·n_lists, ≤ 8192 rows); PAST the clamp (~1M vectors at
      target 256) the blocking automatically switches to the
      two-level (coarse × residual-cell) quantizer
      (similarity.train_centroids_two_level) — list count keeps
      tracking n/target while assignment flattens from O(n·n_lists)
      to O(n·2·sqrt(n_lists)), the standard IVF scaling step.
    * clusters over ``max_cluster_size`` are SUBDIVIDED, not dropped:
      their members get a secondary sign-LSH blocking key (planes
      sized so ``2^planes ≥ max_hot / max_cluster_size``, over
      ``sub_tables`` independent tables for boundary recall — near-dup
      vectors agree on sign bits with high probability, so pairs stay
      co-blocked while the pile splits).  Only sub-blocks STILL over
      the cap after subdivision are dropped (broadcast anti-join) —
      that residue is an undivisible pile of (near-)identical vectors,
      which no pair-preserving split can shrink; collapse those with
      an exact vector-fingerprint dedup upstream instead.

    Centroids come from ``similarity.train_centroids`` (bounded
    id-ordered sample, deterministic); assignment is one Arrow matmul
    pass; the pair join + cosine verify reuse
    :func:`embedding_near_dup`'s one-shuffle blocked shape.  Pairs that
    share several probed blocks are deduped keeping the max cosine.
    """
    import math as _math

    from .similarity import (_all_buckets_udf, _nearest_lists_udf,
                             train_centroids)

    # a negative value would silently shrink the probe count — down to
    # argsort[:, :0] = EMPTY assignments and a quietly empty pair set
    # (the exact silent-recall-loss class the bucket-cap warning
    # exists for) — so refuse loudly (r12 review)
    if extra_probes < 0:
        raise ValueError(f"extra_probes must be >= 0, got {extra_probes}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")

    # NULL/ragged vectors would score NULL cosine and be filtered in
    # the expression path — exclude them up front so the Arrow matmul
    # stages see a rectangular corpus
    # id-ORDERED probe: .first() on a distributed filter is
    # partition-order dependent, which on a mixed-dimension corpus
    # would make WHICH dimension survives vary run to run
    first = (df.where(F.col(vec_col).isNotNull())
             .select(F.col(id_col), F.size(F.col(vec_col)).alias("_d"))
             .orderBy(id_col).first())
    if first is None:
        id_dt = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id_a {id_dt}, id_b {id_dt}, cos_sim double")
    from pyspark.storagelevel import StorageLevel
    df = (df.where(F.col(vec_col).isNotNull()
                   & (F.size(F.col(vec_col)) == F.lit(first["_d"])))
          # up to four actions read this (count, centroid sample,
          # assignment, pair pipeline) — without a persist each one
          # re-executes the caller's upstream pipeline (r13 review)
          .persist(StorageLevel.MEMORY_AND_DISK))

    two_level = False
    if n_lists is None:
        n = df.count()
        # floor of 8: below that, nprobe-fold multi-assignment makes the
        # blocking near-vacuous (every vector probes most clusters)
        want = max(8, _math.ceil(n / target_cluster_size))
        # past the flat clamp (~1M vectors at target 256) the flat
        # codebook stops tracking n/target AND its assignment cost
        # O(n·n_lists) dominates — switch to the two-level
        # (coarse x residual-cell) quantizer: same blocking contract
        # (a dense _cluster id per vector), ~sqrt(n_lists)-sized
        # codebooks on each level, assignment O(n·2·sqrt(n_lists))
        two_level = want > _FLAT_LIST_CLAMP
        n_lists = min(_FLAT_LIST_CLAMP, want)
    if two_level:
        from .similarity import (_nearest_lists_two_level_udf,
                                 train_centroids_two_level)
        side = min(256, _math.ceil(_math.sqrt(want)))
        coarse, fines, offsets = train_centroids_two_level(
            df, vec_col, id_col, n_coarse=side, n_fine=side,
            sample_size=min(max(8192, want), 65536))
        # extra_probes compensates the staged search's boundary
        # recall (measured trade in the docstring table); the default
        # 1 reproduces the original hard-coded nprobe + 1
        assign = _nearest_lists_two_level_udf(coarse, fines, offsets,
                                              nprobe + extra_probes)
        vec_dim = coarse.shape[1]
    else:
        cents = train_centroids(df, vec_col, id_col, n_lists=n_lists,
                                sample_size=max(2048, 2 * n_lists))
        assign = _nearest_lists_udf(cents, nprobe)
        vec_dim = cents.shape[1]
    blocked = df.select(
        F.col(id_col), F.col(vec_col),
        F.explode(assign(F.col(vec_col))).alias("_cluster"))
    hot_rows = []
    if max_cluster_size is not None:
        # the cluster-size agg AND the pair pipeline both read the
        # assignment — persist so the Arrow matmul runs once
        from pyspark.storagelevel import StorageLevel
        blocked = blocked.persist(StorageLevel.MEMORY_AND_DISK)
        # one small agg over (cluster) — ≤ n_lists rows on the driver
        hot_rows = (blocked.groupBy("_cluster")
                    .agg(F.count(F.lit(1)).alias("_n"))
                    .where(F.col("_n") > max_cluster_size)
                    .collect())
        # the agg above materialized blocked's cache; every later read
        # goes through it, so the input's persisted block can be
        # released now instead of accumulating until session end
        # (r13 advice)
        df.unpersist()
    if hot_rows:
        max_hot = max(r["_n"] for r in hot_rows)
        # +1 plane of margin: sign-LSH splits real data unevenly, so
        # aim the EXPECTED sub-block size at cap/2, not exactly cap
        n_sub = min(12, max(1, 1 + _math.ceil(
            _math.log2(max_hot / max_cluster_size))))
        # the trained centroid width IS the corpus vector width; an
        # explicit dim can only equal it or make _all_buckets_udf
        # NULL-bucket every hot vector (posexplode then DROPS all
        # hot-cluster members — silent recall loss, r15 review) —
        # validate loudly instead
        if dim is not None and dim != vec_dim:
            raise ValueError(
                f"dim={dim} does not match the corpus vector width "
                f"{vec_dim}; omit dim to derive it from the data")
        budf = _all_buckets_udf(vec_dim, n_sub, sub_tables, seed)
        hot_ids = [int(r["_cluster"]) for r in hot_rows]
        is_hot = F.col("_cluster").isin(hot_ids)
        cold = blocked.where(~is_hot).select(
            id_col, vec_col, F.col("_cluster").cast("string").alias("_blk"))
        hot_b = (blocked.where(is_hot)
                 .select(id_col, vec_col, "_cluster",
                         F.posexplode(budf(F.col(vec_col)))
                         .alias("_tbl", "_sub"))
                 .select(id_col, vec_col,
                         F.concat_ws("#", F.col("_cluster"), F.col("_tbl"),
                                     F.col("_sub")).alias("_blk")))
        # the union is read twice (still-hot agg + pair pipeline);
        # without its own persist each read re-runs hot_b's Arrow
        # sign-LSH matmul over every hot-cluster member (each >cap
        # rows by definition, × sub_tables) — persist the union and
        # release the raw-assignment cache once it materializes (r15
        # review; the same single-Arrow-pass rule the blocked cache
        # above exists for)
        assign_cached = blocked
        blocked = cold.unionByName(hot_b).persist(
            StorageLevel.MEMORY_AND_DISK)
        # ONE still-hot aggregation feeds both the warning and the
        # anti-join (r13 advice: collecting for the warning and
        # re-aggregating for the join frame ran this job twice).  The
        # collect is the same block-name set the broadcast anti-join
        # would ship anyway, so driver volume is unchanged.
        still_hot_rows = (blocked.groupBy("_blk")
                          .agg(F.count(F.lit(1)).alias("_n"))
                          .where(F.col("_n") > max_cluster_size)
                          .select("_blk").collect())
        # the agg materialized the union's cache; the raw-assignment
        # block behind it is now dead weight
        assign_cached.unpersist()
        if still_hot_rows:
            # the docstring promises the cap warning NAMES the dropped
            # blocks — an anti-join alone cut recall silently (r13
            # review, same class as the lsh ceiling warning)
            import warnings
            warnings.warn(
                f"semantic_dedup: {len(still_hot_rows)} "
                f"sub-block(s) still exceed max_cluster_size="
                f"{max_cluster_size} after sign-LSH subdivision "
                f"(an unsplittable pile-up, e.g. identical vectors); "
                f"their pairs are DROPPED and recall is reduced, "
                f"e.g. _blk = "
                f"{[r['_blk'] for r in still_hot_rows[:5]]}. Raise "
                f"max_cluster_size or pre-dedupe exact-duplicate "
                f"vectors first.", RuntimeWarning, stacklevel=2)
            names = blocked.sparkSession.createDataFrame(
                [(r["_blk"],) for r in still_hot_rows], "_blk string")
            blocked = blocked.join(F.broadcast(names), "_blk", "left_anti")
    else:
        blocked = blocked.select(
            id_col, vec_col, F.col("_cluster").cast("string").alias("_blk"))
    pairs = _blocked_cosine_pairs_matmul(blocked, id_col, vec_col,
                                         "_blk", threshold)
    return (pairs.groupBy("id_a", "id_b")
            .agg(F.max("cos_sim").alias("cos_sim")))


# --------------------------------------------------- duplicated spans

def _span_relation(docs: DataFrame, id_col: str, text_col: str,
                   k: int) -> DataFrame:
    """The ONE (_id, span) construction shared by
    :func:`duplicated_spans` and :func:`span_novelty` — a single
    definition so span tokenization (whitespace convention, slice
    arithmetic) cannot silently diverge between the two operators'
    SQL oracles (code-review r6).  NULL document ids are excluded:
    ``countDistinct`` skips NULLs, so a NULL-id document would make
    its copies score as novel while still emitting a spurious NULL
    output row."""
    if k < 2:
        raise ValueError("span length k must be >= 2")
    toks = (docs.where(F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("_id"),
                    tokens(F.col(text_col)).alias("_t"))
            .where(F.size("_t") >= k))
    return toks.select(
        "_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("_t") - k + 1),
            lambda i: F.concat_ws(" ", F.slice("_t", i, k)))).alias("span"))


def duplicated_spans(docs: DataFrame, id_col: str, text_col: str,
                     k: int = 8, min_docs: int = 2,
                     top: int = 50) -> DataFrame:
    """Cross-document duplicated k-token spans — the exact-substring
    dedup signal of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), reduced to token granularity: any
    run of ``k`` whitespace tokens appearing in ``min_docs`` or more
    distinct documents, ranked by total occurrence count (ties break
    on the span string), top-``top``.

    Tokenization is the engine's standard whitespace convention
    (``trim(lower(text))`` split on ``[ \\t\\n\\r]+`` — identical to
    ``build_vocab``), so a SQL oracle reproduces spans byte-for-byte.

    Scale shape: one narrow map explodes each document into its
    ``n_tokens − k + 1`` spans (JVM-side ``transform`` over a
    ``sequence`` — no Python), then ONE hash aggregate on the span
    string.  Partial aggregation collapses repeats map-side, so the
    shuffle carries (distinct span, partial counts) — the same volume
    profile as any token-frequency job; the rank window runs on the
    already-filtered ≥ ``min_docs`` relation.  At 100 TB you would cut
    the long unique-span tail before the shuffle with a bloom/count
    pre-pass, but the aggregate itself is the linear-scan plan.
    """
    spans = _span_relation(docs, id_col, text_col, k)
    agg = (spans.groupBy("span")
           .agg(F.countDistinct("_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_occurrences"),
                F.min("_id").alias("first_doc"))
           .where(F.col("n_docs") >= min_docs))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("span"))
    return (agg.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= top))


def span_novelty(docs: DataFrame, id_col: str, text_col: str,
                 k: int = 8) -> DataFrame:
    """Per-document span-novelty score — the FineWeb-style curation
    metric behind "how much of this document is copied from elsewhere
    in the corpus": the fraction of a document's k-token spans that
    appear in at least one OTHER document.

    Reuses :func:`duplicated_spans`' tokenization (whitespace
    convention, JVM-side span explode).  Two hash aggregates: span →
    distinct-doc count (map-side combined), then spans joined back to
    their per-doc positions and reduced per document.  The join key is
    the span string — same shuffle volume profile as the span
    frequency job; no pairwise document comparison ever happens.

    Returns ``(id, n_spans, n_shared, novelty)`` where ``novelty =
    round4(1 − n_shared/n_spans)``; documents shorter than ``k``
    tokens have no spans and are EXCLUDED (a 0/0 novelty is
    undefined, not 1.0).
    """
    spans = _span_relation(docs, id_col, text_col, k)
    sharing = (spans.groupBy("span")
               .agg(F.countDistinct("_id").alias("_docs")))
    joined = spans.join(sharing, "span")
    return (joined.groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum(F.when(F.col("_docs") >= 2, 1).otherwise(0))
                 .alias("n_shared"))
            .select(F.col("_id").alias(id_col), "n_spans", "n_shared",
                    round4(1 - F.col("n_shared").cast("double")
                           / F.col("n_spans")).alias("novelty")))
