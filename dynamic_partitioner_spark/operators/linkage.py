"""Fuzzy record linkage: edit-distance-1 pair finding at scale.

The reference has no linkage operator (it is a partitioned sink,
SURVEY.md §2); this is north-star extension surface — the entity-
resolution primitive a training-data pipeline needs for joining noisy
identifiers (user names, product codes, file stems) without an O(n²)
cross join.

Blocking strategy: the SymSpell deletion neighborhood.  Every string
emits ``L+1`` keys — itself plus each single-character deletion.  Two
strings within Levenshtein distance 1 ALWAYS share a key:

* equal strings share the string itself;
* a substitution at position i — both sides' delete-at-i keys match;
* an insertion — the longer side's delete of the inserted character
  equals the shorter side verbatim.

So candidate generation is an equi-join on the deletion key (shuffle on
the key, no nested loop), and an exact ``levenshtein`` verify removes
the false positives the neighborhood admits.  Cost: ``n·(L+1)`` keyed
rows and bucket-local pairing — at 100 TB this is the same banded
shape as MinHash LSH (``dedup.lsh_candidate_pairs``), with recall 100%
by construction rather than probabilistic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_keys(c) -> "F.Column":
    """``array`` of the string plus every single-character deletion —
    Column form (``transform`` over ``sequence``).  Higher-order
    functions evaluate outside codegen (interpreted, O(L²) substr work
    per string); kept as the spec/parity twin of
    :func:`deletion_keys_batched`, which the hot path uses."""
    return F.expr(
        f"transform(sequence(0, length({c})), i -> "
        f"IF(i = 0, {c}, concat(substr({c}, 1, i - 1), substr({c}, i + 1))))"
    )


def deletion_keys_batched(c, max_dist: int = 1) -> "F.Column":
    """Arrow-batched :func:`deletion_keys` — element-for-element
    identical at ``max_dist=1`` (Python slicing and Spark ``substr``
    both index code points), pinned by ``tests/test_linkage.py``.

    ``max_dist=2`` emits the full 2-deletion neighborhood (the string,
    every single deletion, every double deletion — ``1 + L + C(L,2)``
    distinct keys, sorted for determinism): the SymSpell guarantee
    extends, so any two strings within Levenshtein distance 2 share at
    least one key.  Larger radii are rejected (r14 review: the
    else-branch silently computed only the 2-deletion neighborhood,
    so a direct ``max_dist=3`` caller lost recall with no error)."""
    if max_dist not in (1, 2):
        raise ValueError(
            "deletion_keys_batched supports max_dist of 1 or 2; "
            "beyond d=2 the deletion expansion explodes "
            "combinatorially — use an n-gram block instead")

    @F.pandas_udf("array<string>")
    def _dk(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            if max_dist == 1:
                out.append([t] + [t[:i] + t[i + 1:] for i in range(len(t))])
                continue
            dels1 = {t[:i] + t[i + 1:] for i in range(len(t))}
            keys = {t} | dels1
            for u in dels1:
                keys.update(u[:i] + u[i + 1:] for i in range(len(u)))
            out.append(sorted(keys))
        return pd.Series(out)

    return _dk(F.col(c) if isinstance(c, str) else c)


def fuzzy_pairs(df: DataFrame, id_col: str, s_col: str,
                max_dist: int = 1,
                max_key_df: int | None = None) -> DataFrame:
    """All pairs with ``levenshtein(a, b) <= max_dist`` (and ``id_a <
    id_b``), found via deletion-neighborhood blocking — never an O(n²)
    comparison.

    ``max_dist`` of 1 or 2 (the SymSpell d-deletion expansion: two
    strings within distance d always share a ≤d-deletion variant, so
    recall stays complete).  d=2 emits ``1 + L + C(L,2)`` keys per
    string instead of ``1 + L`` — an L/2× key-volume multiplier that
    is the honest price of the larger radius; beyond d=2 the expansion
    explodes combinatorially and an n-gram block
    (``dedup.ngram_jaccard_pairs``) is the better screen.

    Returns ``(id_a, id_b, s_a, s_b, dist)``.  A candidate pair can
    share several deletion keys, so the result is deduped — but the
    levenshtein verify runs BEFORE the distinct: the verify is a
    codegen'd expression evaluated map-side on the join output, so the
    dedup shuffle only carries pairs that actually passed (measured
    ~26% of candidates here), instead of shuffling every duplicate
    candidate first.  At scale this ordering moves the one wide
    shuffle behind the most selective filter in the pipeline.

    ``max_key_df`` is the hot-key guard (same shape as the shingle
    paths' ``max_shingle_df`` / LSH ``max_bucket_size``): a deletion
    key shared by m rows — every 1-char name shares its empty-string
    deletion, every 2-char code shares single characters — contributes
    m²/2 join rows.  Keys above the cap are dropped via a broadcast
    anti-join on the (tiny) hot-key list; a pair sharing ONLY dropped
    keys is lost, so this trades bounded recall for a bounded join.
    Leave None (exact, complete recall) for audits and the oracle; set
    it at corpus scale.
    """
    if max_dist not in (1, 2):
        raise ValueError("fuzzy_pairs supports max_dist of 1 or 2 "
                         "(deletion-neighborhood expansion)")
    keyed = df.select(
        F.col(id_col).alias("_id"), F.col(s_col).alias("_s"),
        F.explode(F.array_distinct(deletion_keys_batched(s_col, max_dist)))
        .alias("_k"))
    # spread the per-key pair fold: the keyed relation is byte-small
    # (the whole self-join plans as a BroadcastHashJoin whose stream
    # side runs on the source scan's 1-2 input partitions), but the
    # join EXPLODES m²/2 candidate rows per deletion key and runs the
    # levenshtein verify on them map-side — CPU volume byte-based
    # split sizing cannot see, so the fold ran on 2 of 32 cores (the
    # r16 shingle-join fix, same shape; no-op on already-wide inputs).
    # Pure relocation, every candidate and verified pair unchanged.
    # The spread sits BEFORE the persist + hot-key anti-join: probing
    # the post-join plan materialized its broadcast (the hot-key
    # aggregate ran twice per call — r16 ADVICE); here the probed plan
    # is scan-only, the persisted blocks land already wide, and the
    # hot aggregate reuses the _k exchange instead of shuffling again.
    from ..functions.partitioning import spread_if_narrow
    keyed = spread_if_narrow(keyed, "_k")
    if max_key_df is not None:
        # the Arrow key-explosion lineage feeds the hot-key aggregate
        # AND both self-join sides — persist so the most expensive map
        # stage runs once, not ~3x (r14 review).  Retention is
        # intentional: the returned frame is lazy and reads this at
        # action time; the block is (corpus x keys)-sized but Spark
        # evicts LRU under pressure, and recomputing it costs more
        # than re-reading it ever can.
        from pyspark.storagelevel import StorageLevel
        keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
        hot = (keyed.groupBy("_k")
               .agg(F.count(F.lit(1)).alias("_n"))
               .where(F.col("_n") > max_key_df)
               .select("_k"))
        keyed = keyed.join(F.broadcast(hot), "_k", "left_anti")
    a = keyed.select(F.col("_id").alias("id_a"), F.col("_s").alias("s_a"),
                     "_k")
    b = keyed.select(F.col("_id").alias("id_b"), F.col("_s").alias("s_b"),
                     "_k")
    return (a.join(b, "_k")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("dist", F.levenshtein("s_a", "s_b"))
            .where(F.col("dist") <= max_dist)
            .select("id_a", "id_b", "s_a", "s_b", "dist")
            .distinct())


def survivorship(df: DataFrame, cluster_col: str, seq_col: str,
                 attr_cols: list[str]) -> DataFrame:
    """Golden-record merge: one surviving row per duplicate cluster,
    each attribute taken from the NEWEST (highest ``seq_col``) record
    where that attribute is non-null — the standard MDM survivorship
    rule, applied column-independently (a stale record can still
    donate a field the newer ones left blank).

    One hash-aggregate on the cluster id: per attribute,
    ``max(struct(seq, attr))`` over non-null rows carries the winning
    value along with its sequence (deterministic: seq ties break by
    the attribute value via the struct comparison).  Composes with
    :func:`fuzzy_pairs` → ``dedup.dedup_clusters`` to close the
    pairs → clusters → golden-record pipeline.
    """
    aggs = [F.count(F.lit(1)).alias("n_members"),
            F.max(seq_col).alias("latest_seq")]
    for c in attr_cols:
        aggs.append(
            F.max(F.when(F.col(c).isNotNull(),
                         F.struct(F.col(seq_col).alias("s"),
                                  F.col(c).alias("v"))))
            .getField("v").alias(c))
    return df.groupBy(cluster_col).agg(*aggs)
