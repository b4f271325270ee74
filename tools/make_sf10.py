"""Inflate the sf1 corpus's DEDUP tables (documents, embeddings)
another 10x into ``.scratch/sf10`` — the 100x-of-driver-SF corpus for
the dedup-ladder scaling proof (r8 VERDICT stretch #9: the blocking
math says linear; measure it where the banded join dominates).

Only the two tables the dedup ladder reads are built (the full sf10
relational corpus would be ~1.8 GB of lineitem nobody scans in these
keys).  Same workload-preserving construction discipline as
``make_sf1.py``:

- ``doc_id``/``vec_id`` offset by ``replica * span`` (sf10 doc ids top
  out ~50k — far under the 1e6 mutant-fixture offset documented in
  ``_augmented_corpus``);
- document words get a SECOND-level suffix (``^k``, distinct from
  level 1's ``~r``) — a vocabulary permutation keeps every
  within-replica shingle/Jaccard relation bit-identical while making
  shingle spaces disjoint across replicas, so near-dup pair counts
  grow 10x (linear), not 100x;
- embeddings get a composed norm-preserving transform per replica k:
  ROTATE by 7k mod 64, then a Walsh-Hadamard SIGN pattern (flip dim i
  iff popcount(i & k) is odd).  Intra-replica dot products are
  EXACTLY unchanged (rotation permutes, the sign pattern cancels);
  across replicas the sign halves disagree on exactly 32 of 64 dims
  and the rotation shifts mass across that partition — measured
  same-base cross-replica cos>=0.3 leak-through is ~0.6% (sign alone
  3.9%), a bounded LINEAR pair bump, and no two (r, k) transform
  compositions coincide (equal rotations mod 64 imply different sign
  patterns), so no exact duplicates are planted.

NOT driver testdata, never used for correctness oracles.

Usage: python tools/make_sf10.py [out_dir]   (default .scratch/sf10)
"""

from __future__ import annotations

import os
import sys

import duckdb

REPLICAS = 10
SRC = "/root/repo/.scratch/sf1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    if not os.path.exists(f"{SRC}/documents.parquet"):
        sys.exit("build the sf1 corpus first: python tools/make_sf1.py")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS FROM '{SRC}/{t}.parquet'")
    con.execute(
        f"CREATE VIEW k AS SELECT unnest(range({REPLICAS})) AS k")
    spans = {
        "doc": con.execute(
            "SELECT max(doc_id) + 1 FROM documents").fetchone()[0],
        "vec": con.execute(
            "SELECT max(vec_id) + 1 FROM embeddings").fetchone()[0],
    }

    sql = {
        "documents": f"""
            SELECT doc_id + k * {spans['doc']} AS doc_id,
                   CASE WHEN k = 0 THEN text ELSE
                        array_to_string(list_transform(
                            string_split(text, ' '),
                            w -> w || '^' || CAST(k AS VARCHAR)), ' ')
                   END AS text,
                   lang, source,
                   CASE WHEN k = 0 THEN n_chars ELSE
                        length(array_to_string(list_transform(
                            string_split(text, ' '),
                            w -> w || '^' || CAST(k AS VARCHAR)), ' '))
                   END AS n_chars
            FROM documents, k""",
        "embeddings": f"""
            SELECT vec_id + k * {spans['vec']} AS vec_id,
                   CAST(list_transform(
                        list_concat(
                            embedding[len(embedding) - ((7 * k) % 64) + 1:],
                            embedding[:len(embedding) - ((7 * k) % 64)]),
                        (x, i) -> CASE WHEN
                            bit_count(CAST(i - 1 AS BIGINT) & k) % 2 = 1
                            THEN -x ELSE x END) AS FLOAT[]) AS embedding,
                   label
            FROM embeddings, k""",
    }
    for t, q in sql.items():
        con.execute(
            f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'") \
            .fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"sf10 dedup corpus written to {out}")


if __name__ == "__main__":
    main()
