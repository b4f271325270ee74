"""Per-round benchmark: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Query selection: the write path (the reference's core), the analytical
read path over the written data, and the scale-relevant extension ops.
Exact quadratic audit ops (ngram/simhash pairs) are excluded — the
sketch variants are the at-scale path and are benchmarked instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_KEYS = [
    "partitioned_write_single",
    "partitioned_write_multi",
    "partitioned_write_orc",
    "partitioned_write_avro",
    "append_mode",
    "streaming_partitioned_write",
    "streaming_windowed_agg",
    "streaming_stateful_counts",
    "event_sessionize",
    "query_pruned_agg",
    "query_join_broadcast",
    "query_window_topk",
    "query_rollup",
    "query_percentiles",
    "events_json_extract",
    "events_asof_join",
    "dedup_exact",
    "query_distinct_agg",
    "dedup_minhash",
    "similarity_topk",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "text_stats",
    "text_quality",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "corpus_quality_filter",
    "embedding_roundtrip",
    "mm_features",
    "catalog_table",
    "partition_compact",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from dynamic_partitioner_spark import get_spark

    spark = get_spark("bench")
    qs = E.queries()

    # warm the JVM/codegen once on the smallest SF so the measured runs
    # are engine time, not first-query setup
    qs["query_pruned_agg"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    total = 0.0
    for key in BENCH_KEYS:
        t0 = time.time()
        n = qs[key](spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        timings[key] = dt
        total += dt
        print(f"# {key}: {n} rows in {dt}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
