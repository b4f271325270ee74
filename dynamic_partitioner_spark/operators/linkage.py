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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_keys(c) -> "F.Column":
    """``array`` of the string plus every single-character deletion —
    pure codegen (``transform`` over ``sequence``), no Python."""
    return F.expr(
        f"transform(sequence(0, length({c})), i -> "
        f"IF(i = 0, {c}, concat(substr({c}, 1, i - 1), substr({c}, i + 1))))"
    )


def fuzzy_pairs(df: DataFrame, id_col: str, s_col: str,
                max_dist: int = 1) -> DataFrame:
    """All pairs with ``levenshtein(a, b) <= max_dist`` (and ``id_a <
    id_b``), found via deletion-neighborhood blocking — never an O(n²)
    comparison.

    Only ``max_dist=1`` is supported: the single-deletion neighborhood
    guarantees complete recall exactly for distance ≤ 1.  Larger radii
    need the d-deletion expansion (|keys| = C(L,d)), which explodes key
    volume; callers wanting d ≥ 2 should compose this with an n-gram
    block (``dedup.jaccard_pairs``) instead.

    Returns ``(id_a, id_b, s_a, s_b, dist)``.  A candidate pair can
    share several deletion keys, so candidates are made distinct
    BEFORE the levenshtein verify — the dedup shuffle is on the thin
    (id, id, s, s) relation, and the verify itself is one codegen'd
    expression per surviving pair.
    """
    if max_dist != 1:
        raise ValueError("fuzzy_pairs supports max_dist=1 only "
                         "(single-deletion neighborhood)")
    keyed = df.select(
        F.col(id_col).alias("_id"), F.col(s_col).alias("_s"),
        F.explode(F.array_distinct(deletion_keys(s_col))).alias("_k"))
    a = keyed.select(F.col("_id").alias("id_a"), F.col("_s").alias("s_a"),
                     "_k")
    b = keyed.select(F.col("_id").alias("id_b"), F.col("_s").alias("s_b"),
                     "_k")
    cand = (a.join(b, "_k")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "s_a", "s_b")
            .distinct())
    return (cand
            .withColumn("dist", F.levenshtein("s_a", "s_b"))
            .where(F.col("dist") <= max_dist))
