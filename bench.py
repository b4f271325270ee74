"""Per-round benchmark: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Query selection: every driver key in ``__spark_entry__.queries()`` —
round-over-round regressions stay visible for the full surface,
including the exact quadratic audit ops (ngram/simhash pairs), whose
cost relative to their sketch variants is itself worth tracking.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from dynamic_partitioner_spark import get_spark

    spark = get_spark("bench")
    qs = E.queries()

    # warm the JVM/codegen AND the Arrow python workers once on the
    # smallest SF so the measured runs are engine time, not
    # first-query setup (python worker fork + pickle costs ~0.5s and
    # would otherwise be charged to whichever pandas-UDF key runs
    # first)
    qs["query_pruned_agg"](spark, "/root/testdata/sf0.001").count()
    qs["text_repetition"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    total = 0.0
    for key in qs:
        # streaming keys: median of 3 — micro-batch scheduling adds
        # run-to-run noise of the same magnitude as a real regression
        # (r6→r7 showed ±20-50% on identical code), so a single sample
        # can both hide and invent one.  Batch keys stay single-run.
        reps = 3 if key.startswith("streaming_") else 1
        samples = []
        for _ in range(reps):
            t0 = time.time()
            n = qs[key](spark, sf_dir).count()
            samples.append(time.time() - t0)
        dt = round(sorted(samples)[len(samples) // 2], 3)
        timings[key] = dt
        total += dt
        print(f"# {key}: {n} rows in {dt}s"
              + (f" (median of {reps})" if reps > 1 else ""),
              file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Full per-key timings go to a side file; the printed line keeps only
    # the most expensive keys so it stays within the driver's tail buffer
    # (the r02 line with all 101 keys overflowed it and failed to parse).
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump({"sf": float(sf), "total_sec": round(total, 3),
                   "n_queries": len(timings), "queries": timings}, f,
                  indent=1, sort_keys=True)
    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:30])
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "n_queries": len(timings),
        "queries": {k: timings[k] for k in timings if k in top},
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
