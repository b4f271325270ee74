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


#: 1-min load above which a run's timings are not baseline material
#: (the committed-baseline policy every round's VERDICT applies); the
#: ratchet guard in main() redirects the full-detail write to a
#: gitignored *_hot.json side file past it.
QUIET_LOAD_POLICY = 0.5


#: 5-min load above which a run counts as drain-contaminated even when
#: the 1-min average has already dropped below QUIET_LOAD_POLICY (r16
#: ADVICE: a run that starts in a multi-minute drain tail measured a
#: 1.27x uniform inflation with start load1 = 0.29 but load5 = 1.59 —
#: the 1-min-only gate let it overwrite the committed baseline)
QUIET_LOAD5_POLICY = 1.0


def baseline_out_name(full_name: str, load: tuple,
                      cpus: int | str | None = None) -> str:
    """Where this run's full-detail JSON goes: the committed baseline
    file on a quiet start, a gitignored ``*_hot_c{cpus}.json`` side
    file when the start load says the timings are not baseline
    material (r15 VERDICT #4 — a hot run must never reset the
    round-over-round comparator).  Hot because the 1-min average is
    at/above the quiet policy OR the 5-min average shows a drain tail
    (r16 ADVICE).  The cpus suffix keeps one run's detail from
    overwriting another's — the r16 driver's 8-core run clobbered its
    32-core run's full detail in the single ``_hot.json`` slot (r16
    VERDICT #3)."""
    if load[0] >= QUIET_LOAD_POLICY or load[1] >= QUIET_LOAD5_POLICY:
        suffix = f"_hot_c{cpus}" if cpus else "_hot"
        return full_name.replace(".json", f"{suffix}.json")
    return full_name


def sweep_writer_debris(scratch: str) -> tuple[int, list[str]]:
    """Writer-debris canary (r9 VERDICT #7): after the full-key pass,
    sweep the run's own scratch outputs for the crash-debris class
    suspected behind the ops_compaction_plan driver reds — committer
    staging dirs (``_temporary``) anywhere, plus unreferenced batch
    dirs inside versioned tables (the commit-log contract comes from
    ``operators/versioned.py`` itself — r10 review: a hand-rolled
    copy would silently flag every healthy batch if the log schema
    changed; the ``ops_orphan_files`` table is skipped because it
    plants two orphans by design).  Driver listings only."""
    from dynamic_partitioner_spark.operators.versioned import (
        is_batch_shaped, unreferenced_dirs)
    debris: list[str] = []
    errors: list[str] = []
    if not os.path.isdir(scratch):
        return 0, debris
    for root, dirs, _files in os.walk(scratch):
        for d in list(dirs):
            if d == "_temporary":
                debris.append(os.path.relpath(os.path.join(root, d),
                                              scratch))
                dirs.remove(d)
    for table in sorted(os.listdir(scratch)):
        tdir = os.path.join(scratch, table)
        if table == "ops_orphan_files" \
                or not os.path.isdir(os.path.join(tdir, "_log")):
            continue
        try:
            debris.extend(f"{table}/{name}"
                          for name in unreferenced_dirs(tdir)
                          if is_batch_shaped(name))
        except Exception as exc:
            # the sweep's premise is post-crash state of unknown
            # shape (r10 review: an unreadable/corrupt commit file
            # must not discard the whole bench run's results after
            # the multi-minute query pass) — surface it as a visible
            # marker instead of raising
            errors.append(f"{table}/_log!{type(exc).__name__}")
    # markers ride along in the dirs list for diagnosis but do NOT
    # count as debris — a transient sweep error must not flip the
    # canary from "oracle dialect suspected" to "crash debris
    # implicated" (r10 review)
    return len(debris), (debris + errors)[:20]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # sample the host's load BEFORE the JVM spin-up and warmup queries
    # saturate the cores: sampling after them inflates the 1-min
    # average with the bench's own work, which would make quiet-host
    # runs self-exceed the ratchet guard's policy below and never
    # refresh the committed baseline (r16 review)
    load_start = os.getloadavg()
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

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    here = os.path.dirname(os.path.abspath(__file__))
    # previous full run at the same SF — the common-key ratio below is
    # the ONLY sane round-over-round comparison: identical 245-key runs
    # in one r8 session spanned 260→342 s (host contention, uniform
    # across unrelated keys), so absolute seconds self-label as noise
    # only through a ratio + the load/canary fields
    # BENCH_FULL.json is the committed sf0.1 round-over-round baseline;
    # other SFs read/write their own side file so an ad-hoc run still
    # gets a same-SF ratio without clobbering the canonical baseline
    full_name = ("BENCH_FULL.json" if float(sf) == 0.1
                 else f"BENCH_FULL_sf{sf}.json")
    prev: dict[str, float] = {}
    prev_labeled = None
    try:
        with open(os.path.join(here, full_name)) as f:
            prev_doc = json.load(f)
        if prev_doc.get("sf") == float(sf):
            prev = prev_doc.get("queries", {})
            # a baseline missing its noise self-labels is untrusted:
            # the committed r10 driver artifact had none, its inflated
            # timings silenced the >1.3x remeasure on dedup_apply for
            # a whole round (r11 VERDICT "What's wrong" #1).  Mark it
            # loudly; tests/test_bench_tools.py reds an unlabeled
            # committed BENCH_FULL outright.
            # same field set tests/test_bench_tools.py reds on — two
            # definitions of "labeled" would let an intermediate-
            # schema artifact pass one gate and fail the other
            prev_labeled = all(k in prev_doc for k in
                               ("canary_ratio", "remeasured", "load",
                                "load_end", "canary_keys"))
            if not prev_labeled:
                print("# WARNING: prev baseline lacks noise "
                      "self-labels (canary_ratio/remeasured/load) — "
                      "round-over-round ratios vs it are untrusted",
                      file=sys.stderr)
    except (OSError, ValueError):
        pass
    # median-of-3 keys: streaming (micro-batch scheduling noise of
    # regression magnitude, r6→r7 showed ±20-50% on identical code)
    # and the iterative multi-job ops whose wall time is job-count
    # overhead (r8's graph_pagerank 2.08x flag was host noise;
    # dedup_apply runs the same label-propagation loop as
    # dedup_clusters and cold-sampled 2-3x its warm wall in both r10
    # and r11 driver runs — r11 VERDICT #3)
    ITERATIVE = {"graph_pagerank", "dedup_semantic", "dedup_apply"}
    timings: dict[str, float] = {}
    total = 0.0
    for key in qs:
        reps = 3 if (key.startswith("streaming_") or key in ITERATIVE) \
            else 1
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

    # any key whose round-over-round ratio exceeds 1.3 in the main
    # pass gets a median-of-3 remeasure (r9 VERDICT #8) — identical
    # same-host runs have spanned 1.07-1.40x, so a single slow sample
    # must self-label as noise or survive as a real regression.  The
    # remeasure is RECORDED NEXT TO the first sample, never written
    # over it (r10 review): the two re-runs are fully page-cache/JIT
    # warm, so replacing the timing would mask real cold-path
    # regressions AND ratchet the committed baseline warmer every
    # round (warm baseline -> more >1.3 cold samples -> more warm
    # medians).  A key is noise if median3/prev is back near 1.0; a
    # real regression keeps median3 high too.
    remeasured: dict[str, dict] = {}
    for key, dt in list(timings.items()):
        if key.startswith("streaming_") or key in ITERATIVE:
            continue  # already median-of-3
        if prev.get(key, 0) > 0 and dt / prev[key] > 1.3:
            # identical-run variance spans 1.07-1.40x on this host, so
            # remeasures WILL trigger on noise — a re-run that raises
            # (loud-certifying ops_* key hitting a transient write
            # error) must not sink the whole multi-minute run's JSON
            # line this late (r10 ADVICE #1); record the failure as a
            # marker instead
            samples = [dt]
            err = None
            for _ in range(2):
                t0 = time.time()
                try:
                    qs[key](spark, sf_dir).count()
                except Exception as exc:
                    err = f"{type(exc).__name__}: {exc}"[:200]
                    break
                samples.append(time.time() - t0)
            if err is not None:
                # keep any successful re-run sample — a lone warm
                # sample still distinguishes noise from regression
                # (r11 ADVICE #2)
                remeasured[key] = {"first": dt, "prev": prev[key],
                                   "samples": [round(s, 3)
                                               for s in samples],
                                   "error": err}
                print(f"# {key}: remeasure re-run RAISED ({err}) — "
                      f"first sample kept", file=sys.stderr)
                continue
            med = round(sorted(samples)[1], 3)
            remeasured[key] = {"first": dt, "median3": med,
                               "prev": prev[key]}
            print(f"# {key}: ratio>1.3 vs prev — median-of-3 {med}s "
                  f"(first sample kept in timings)", file=sys.stderr)

    # canary: re-run the 10 most expensive batch keys once; a canary
    # ratio far from 1.0 labels THIS run as taken on a noisy host
    canary_keys = [k for k, _ in sorted(timings.items(),
                                        key=lambda kv: -kv[1])
                   if not k.startswith("streaming_")][:10]
    ratios = []
    for key in canary_keys:
        t0 = time.time()
        try:
            qs[key](spark, sf_dir).count()
        except Exception as exc:  # same late-run fragility class as
            # the remeasure loop — drop the sample, keep the run
            print(f"# canary re-run of {key} RAISED "
                  f"({type(exc).__name__}) — sample dropped",
                  file=sys.stderr)
            continue
        if timings[key] > 0:
            ratios.append((time.time() - t0) / timings[key])
    canary_ratio = round(sorted(ratios)[len(ratios) // 2], 3) \
        if ratios else None

    common = [timings[k] / prev[k] for k in timings
              if prev.get(k, 0) > 0 and timings[k] > 0]
    common_ratio = round(sorted(common)[len(common) // 2], 3) \
        if common else None

    # writer-debris canary (r9 VERDICT #7): nonzero implicates crash/
    # retry debris (hypothesis a) for any same-round driver red; zero
    # shifts suspicion to the oracle dialect (hypothesis b).  The
    # sweep itself must never sink the run's results this late.
    try:
        orphan_dirs_seen, orphan_dirs = sweep_writer_debris(E.SCRATCH)
    except Exception as exc:
        orphan_dirs_seen, orphan_dirs = -1, [f"sweep!{type(exc).__name__}"]

    # Full per-key timings go to a side file; the printed line keeps only
    # the most expensive keys so it stays within the driver's tail buffer
    # (the r02 line with all 101 keys overflowed it and failed to parse).
    # The noise self-labels are written HERE as well as stdout (r10
    # VERDICT #4: the driver's BENCH_r10.json tail truncated at 2,311
    # bytes and lost every adjudication field) — the committed artifact
    # must carry them durably.
    # structural ratchet guard (r15 VERDICT #4, third recurrence of a
    # hot driver run overwriting the committed quiet baseline): when
    # the run STARTED on a loaded host, the timings are not baseline
    # material — write them to a side file (gitignored) and leave the
    # committed comparator alone.  The stdout payload names the file
    # so the round artifact still records where the full detail went.
    cpus = os.environ.get("SPARK_GRAFT_CPUS") \
        or spark.sparkContext.defaultParallelism
    out_name = baseline_out_name(full_name, load_start, cpus)
    if out_name != full_name:
        print(f"# start load {load_start[0]:.2f}/{load_start[1]:.2f} "
              f"(1/5 min) exceeds quiet policy "
              f"{QUIET_LOAD_POLICY}/{QUIET_LOAD5_POLICY} — full detail "
              f"written to {out_name}; committed baseline NOT "
              f"overwritten", file=sys.stderr)
    with open(os.path.join(here, out_name), "w") as f:
        json.dump({"sf": float(sf), "total_sec": round(total, 3),
                   "n_queries": len(timings), "queries": timings,
                   "common_key_ratio": common_ratio,
                   "n_common_keys": len(common),
                   "load": [round(x, 2) for x in load_start],
                   "load_end": [round(x, 2) for x in os.getloadavg()],
                   "canary_ratio": canary_ratio,
                   "canary_keys": canary_keys,
                   "remeasured": remeasured,
                   "orphan_dirs_seen": orphan_dirs_seen,
                   "orphan_dirs": orphan_dirs,
                   "prev_baseline_labeled": prev_labeled,
                   # timeless fact only — round-specific adjudication
                   # lives in the per-round VERDICT/ADVICE artifacts
                   # (r11 ADVICE #1)
                   "notes": ("AQE initialPartitionNum=512 (the sf10 "
                             "spill fix) adds task-scheduling overhead "
                             "to shuffle-heavy keys at small SF; scale "
                             "posture paid at bench SF")}, f,
                  indent=1, sort_keys=True)
    print(json.dumps(bounded_stdout_payload(
        timings, total, float(sf), common_ratio, len(common),
        load_start, canary_ratio, canary_keys, remeasured,
        orphan_dirs_seen, orphan_dirs, prev_labeled,
        detail=out_name)))


def bounded_stdout_payload(timings: dict, total: float, sf: float,
                           common_ratio, n_common, load_start,
                           canary_ratio, canary_keys, remeasured,
                           orphan_dirs_seen, orphan_dirs,
                           prev_labeled, budget: int = 1800,
                           detail: str = "BENCH_FULL.json") -> dict:
    """Build the single stdout JSON line, bounded to ``budget`` bytes.

    The driver captures only the LAST 2000 bytes of stdout, so the
    line must fit that window or the round artifact records
    ``parsed: null`` (r10 overflowed via full per-key timings; r12
    via a 26-entry ``remeasured`` dict — r12 VERDICT #3).  The full
    remeasured dict and all timings stay durable in BENCH_FULL.json;
    stdout carries the adjudication SUMMARY — how many keys were
    remeasured and which ones HELD >=1.3x after the warm median-of-3
    (the only entries a reader acts on) — and the top-N queries
    shrink until the line fits (r9/r11 parsed fine at ~1350 bytes)."""
    hot = sorted(k for k, v in remeasured.items()
                 if v.get("median3") is not None and v["prev"] > 0
                 and v["median3"] / v["prev"] >= 1.3)
    errs = sorted(k for k, v in remeasured.items() if "error" in v)
    payload = {
        # full hot/err COUNTS stay authoritative even when the name
        # lists below are capped (r16 VERDICT #2: an 83-key remeasure
        # run's hot list ate the byte budget and squeezed the queries
        # window to 6, leaving the driver's PERF table 5 comparable
        # keys — the top-N queries dict is the round's PRIMARY
        # measurement artifact and must win the budget fight)
        "remeasured_hot_n": len(hot),
        "remeasured_err_n": len(errs),
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf,
        # round-over-round median ratio on keys common with the last
        # committed full run at this SF (None on SF change / first run)
        "common_key_ratio": common_ratio,
        "n_common_keys": n_common,
        "load": [round(x, 2) for x in load_start],
        "load_end": [round(x, 2) for x in os.getloadavg()],
        "canary_ratio": canary_ratio,
        "canary_keys": canary_keys,
        "remeasured_n": len(remeasured),
        "remeasured_hot": hot,
        "remeasured_err": errs,
        "orphan_dirs_seen": orphan_dirs_seen,
        "orphan_dirs": orphan_dirs[:5],
        "prev_baseline_labeled": prev_labeled,
        "detail": detail,
    }
    # err names are rare and actionable — keep (up to 5 of) them ahead
    # of everything below; the final fallback can still trim them
    payload["remeasured_err"] = errs[:5]
    top30 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:30])
    # cap the hot NAME list before surrendering a single queries
    # entry: shrink the cap first, and only if the smallest cap still
    # overflows start narrowing the queries window
    for cap in (8, 5, 3, 1, 0):
        payload["remeasured_hot"] = hot[:cap]
        payload["queries"] = top30
        if len(json.dumps(payload)) <= budget:
            break
    else:
        for top_n in (20, 12, 6, 0):
            payload["queries"] = dict(
                sorted(timings.items(), key=lambda kv: -kv[1])[:top_n])
            if len(json.dumps(payload)) <= budget:
                break
    # pathological fallback: a mass-regression run could make the hot
    # list ITSELF exceed the window — truncate the name lists rather
    # than overflow (the counts stay authoritative; every name lives
    # durably in BENCH_FULL.json)
    for field in ("remeasured_hot", "remeasured_err", "canary_keys"):
        while len(json.dumps(payload)) > budget and payload[field]:
            payload[field] = payload[field][:-1]
    return payload


if __name__ == "__main__":
    main()
