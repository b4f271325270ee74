"""Minimal snapshot-versioned table: plain parquet data files plus a
JSON commit log — the lakehouse time-travel primitive (Delta/Iceberg
shape) reduced to its core, with none of either format's machinery.

Layout::

    <path>/_log/00000001.json   {"version": 1, "mode": "append"|"overwrite",
                                 "dirs": ["batch-00000001"]}
    <path>/batch-00000001/...   ordinary parquet files

A read "as of version v" unions the batch directories of every commit
after the last ``overwrite`` at-or-before ``v`` — so appends
accumulate and an overwrite starts a new visible set, exactly Delta's
snapshot semantics for the two write modes supported here.

Scale posture: the log is metadata (bytes per commit, read once on the
driver); the data path is untouched parquet, so partition pruning,
pushdown and every other scan property still apply.  Single-writer
assumption, documented: production systems make the log append atomic
via rename/optimistic-concurrency (Delta PROTOCOL.md does exactly
this); this operator targets reproducible pipeline reads ("train on
the corpus exactly as it was at version 12"), not concurrent writers.

No counterpart in the reference (its sink has CREATE/APPEND but no
versions); public design, cited above.
"""

from __future__ import annotations

import json
import os
import shutil
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the batch-dir name pattern — SINGLE authority, shared by the
#: writer's format string (``batch-{version:08d}``), the manifest's
#: file→dir attribution regexp and :func:`is_batch_shaped`.  ``{8,}``
#: not ``{8}``: the zero-padded width GROWS past version 10^8, and a
#: width-exact pattern there would silently detach every file from
#: its stats (manifest n_rows=0, read_pruned EMPTY) — the same
#: 9th-digit scale the commit-log sort was made exact for (r13),
#: but with a silent failure shape instead of a loud one (r15 review)
_BATCH_SEG = r"batch-\d{8,}"


def _write_json_atomic(target: str, payload: dict) -> None:
    """Write-then-rename so a torn write never looks like a commit —
    the ONE durability mechanism for every log mutation (commit,
    compaction commit, vacuum floor); hardening (fsync, checksums)
    happens here and nowhere else (r15 review: three copies had
    already drifted into place).  The tmp file is fsynced before the
    rename and the log directory after it, so a power loss can no
    longer surface a renamed-but-truncated commit (every later read
    would die at json.load) or un-happen a rename whose batch dir
    survives (r15 ADVICE)."""
    tmp = target + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, target)
    dfd = os.open(os.path.dirname(target), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _require_commits(path: str) -> list[dict]:
    """The non-empty commit log, or a loud FileNotFoundError."""
    commits = _commits(path)
    if not commits:
        raise FileNotFoundError(f"no commits under {path}")
    return commits


def _check_local(path: str) -> None:
    """The commit log uses driver-local ``os`` I/O, so the table path
    must be a local filesystem path — a remote scheme (hdfs://,
    s3a://) would silently split the data (written via Spark's Hadoop
    FS) from the log (written to the driver's disk).  Fail loudly
    instead; a Hadoop-FS log backend is the documented extension
    point."""
    if "://" in path:
        raise ValueError(
            f"versioned tables support local paths only (got {path!r}): "
            "the JSON commit log is written with driver-local I/O, so a "
            "remote data path would split table data and log across "
            "filesystems")


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _commits(path: str) -> list[dict]:
    ld = _log_dir(path)
    if not os.path.isdir(ld):
        return []
    out = []
    # underscore-prefixed files are log metadata (_vacuum.json), not
    # commits; order NUMERICALLY by the filename's version — lexical
    # sort breaks at the 9th digit (100000000.json < 99999999.json),
    # which would corrupt the version counter and overwrite ordering
    # (r13 review; unreachable in practice, one-line to make exact)
    names = [n for n in os.listdir(ld)
             if n.endswith(".json") and not n.startswith("_")
             and n[:-5].isdigit()]
    for name in sorted(names, key=lambda n: int(n[:-5])):
        with open(os.path.join(ld, name)) as fh:
            out.append(json.load(fh))
    return out


def versioned_write(df: DataFrame, path: str,
                    mode: str = "append") -> int:
    """Commit ``df`` as the next table version; returns the version
    number.  ``mode='append'`` adds to the visible set,
    ``'overwrite'`` replaces it (earlier versions stay readable —
    that is the point)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")
    _check_local(path)
    commits = _commits(path)
    version = (commits[-1]["version"] + 1) if commits else 1
    batch = f"batch-{version:08d}"
    # overwrite, not error: a crash AFTER this write but BEFORE the log
    # rename leaves an orphan batch dir that is invisible (no commit) —
    # the retry must be able to reclaim it, or the version counter
    # could never advance past the orphan
    df.write.mode("overwrite").parquet(os.path.join(path, batch))
    os.makedirs(_log_dir(path), exist_ok=True)
    _write_json_atomic(os.path.join(_log_dir(path), f"{version:08d}.json"),
                       {"version": version, "mode": mode, "dirs": [batch]})
    return version


def versioned_write_slices(df: DataFrame, slice_col: str,
                           plan: list[tuple], path: str) -> list[int]:
    """Commit MANY slices of one DataFrame as consecutive versions with
    a SINGLE Spark write job — the bulk-backfill shape (N history
    commits staged in one pass over the source instead of N sequential
    jobs each re-scanning it).

    ``plan`` is the ordered commit plan ``[(slice_value, mode), ...]``
    over INTEGER slice values: rows with ``df[slice_col] ==
    slice_value`` become version ``next + i`` with that entry's mode.
    Rows whose slice value is in no plan entry are ignored.  Each
    commit lands as exactly ONE parquet file (every slice hash-lands
    in one task of the staging repartition, and the partitioned writer
    opens one file per directory per task).  ``slice_col`` is the
    staging partition key and is therefore STRIPPED from the data
    files — add it as a throwaway column, and duplicate it under
    another name if the committed rows should carry it.

    Semantics are identical to calling :func:`versioned_write` once
    per slice in plan order (same batch dirs, same log entries, same
    rows — pinned in tests/test_versioned.py); the difference is one
    source pass and one job instead of N.  Crash safety matches
    :func:`versioned_write`: data stages under an underscore-prefixed
    dir (invisible to readers), then per commit the batch dir is
    populated BEFORE its log entry lands (write-then-rename), in
    ascending version order — a crash leaves only invisible orphan
    dirs that :func:`find_orphans` reports and a retry reclaims.

    A plan slice that matched NO rows raises loudly: an empty commit
    here is a fixture/backfill bug, and silently skipping it would
    shift every later slice's version number.
    """
    if not plan:
        raise ValueError("empty commit plan")
    if len({s for s, _ in plan}) != len(plan):
        raise ValueError("duplicate slice values in commit plan")
    bad = [m for _, m in plan if m not in ("append", "overwrite")]
    if bad:
        raise ValueError(f"unsupported mode {bad[0]!r}")
    _check_local(path)
    commits = _commits(path)
    v0 = (commits[-1]["version"] + 1) if commits else 1
    # reclaim stale stage dirs whose version is <= v0: a crash after a
    # partial commit prefix advances v0 on retry, so the crashed
    # attempt's _stage-{old v0} would otherwise be stranded forever as
    # pseudo-orphan debris (r16 review).  Underscore dirs are
    # reader-invisible, and under the documented single-writer
    # assumption every such dir is reclaimable — but the sweep still
    # stops at v0 so a hypothetical concurrent writer staging a HIGHER
    # version is never destroyed mid-commit (r16 ADVICE: an
    # all-_stage-* rmtree turned a version-scoped reclaim into
    # potential cross-writer data loss); an unparsable suffix is
    # treated as crash debris of unknown vintage and reclaimed.
    if os.path.isdir(path):
        for name in os.listdir(path):
            if not name.startswith("_stage-"):
                continue
            try:
                stage_v = int(name[len("_stage-"):])
            except ValueError:
                stage_v = v0
            if stage_v <= v0:
                shutil.rmtree(os.path.join(path, name),
                              ignore_errors=True)
    stage = os.path.join(path, f"_stage-{v0:08d}")
    values = [s for s, _ in plan]
    # the staging partition column is cast to long IN PLACE so the
    # directory names round-trip exactly; hash-repartitioning on it
    # lands every slice wholly in one task -> one file per slice,
    # and partitionBy strips it from the data files
    (df.withColumn(slice_col, F.col(slice_col).cast("long"))
       .where(F.col(slice_col).isin(values))
       .repartition(len(plan), F.col(slice_col))
       .write.mode("overwrite").partitionBy(slice_col).parquet(stage))
    try:
        # validate EVERY slice staged before committing ANY: a plan
        # slice that matched no rows must leave the table untouched
        # (zero commits), not a half-committed prefix — an empty
        # commit would silently renumber every later slice
        staged: dict = {}
        for value, _ in plan:
            src = os.path.join(stage, f"{slice_col}={int(value)}")
            parts = sorted(n for n in os.listdir(src)
                           if n.endswith(".parquet")) \
                if os.path.isdir(src) else []
            if not parts:
                raise ValueError(
                    f"slice {slice_col}={value!r} matched no rows — an "
                    "empty commit would silently renumber every later "
                    "slice; fix the plan or the fixture")
            staged[value] = (src, parts)
        versions = []
        for i, (value, mode) in enumerate(plan):
            version = v0 + i
            src, parts = staged[value]
            batch = f"batch-{version:08d}"
            batch_full = os.path.join(path, batch)
            shutil.rmtree(batch_full, ignore_errors=True)
            os.makedirs(batch_full)
            for n in parts:
                os.replace(os.path.join(src, n),
                           os.path.join(batch_full, n))
            os.makedirs(_log_dir(path), exist_ok=True)
            _write_json_atomic(
                os.path.join(_log_dir(path), f"{version:08d}.json"),
                {"version": version, "mode": mode, "dirs": [batch]})
            versions.append(version)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return versions


def _visible_dirs(path: str, version: int | None = None) -> list[str]:
    """Resolve the batch dirs visible at ``version`` (default latest),
    with the same existence/vacuum validation ``read_version`` always
    had: appends accumulate, an overwrite starts a new visible set."""
    _check_local(path)
    commits = _require_commits(path)
    latest = commits[-1]["version"]
    if version is None:
        version = latest
    # versions are contiguous from 1 by construction (next = last + 1)
    if not 1 <= version <= latest:
        raise ValueError(f"version {version} does not exist under {path}"
                         f" (latest is {latest})")
    floor = _vacuum_floor(path)
    if version < floor:
        # surviving dirs could serve a PARTIAL snapshot — refuse loudly
        raise ValueError(
            f"version {version} was vacuumed (retention floor is "
            f"{floor}); only versions >= {floor} are readable")
    visible = [c for c in commits if c["version"] <= version]
    dirs: list[str] = []
    for c in visible:
        if c["mode"] == "overwrite":
            dirs = []
        dirs.extend(c["dirs"])
    return dirs


def read_version(spark: SparkSession, path: str,
                 version: int | None = None) -> DataFrame:
    """Read the table as of ``version`` (default: latest).  Raises on
    an empty table or a version that never existed."""
    dirs = _visible_dirs(path, version)
    return spark.read.parquet(*[os.path.join(path, d) for d in dirs])


def snapshot_manifest(spark: SparkSession, path: str,
                      version: int | None = None,
                      stat_cols: tuple[str, ...] | list[str] = ()
                      ) -> DataFrame:
    """Iceberg-shaped manifest listing for a snapshot: one row per
    data FILE in the version's visible set, carrying what a planner
    needs to prune files without opening them — row count, per-column
    lower/upper bounds and null counts (Iceberg's ``manifest_entry``
    ``lower_bounds``/``upper_bounds``/``null_value_counts``, Apache
    Iceberg spec §Manifests), plus the commit that added the file and
    its size.

    Returns one row per file with columns::

        commit_version  batch_dir  file_name  size_bytes  n_rows
        min_<c>  max_<c>  nulls_<c>      (for each c in stat_cols)

    A caller prunes by intersecting a predicate with the bounds, then
    reads only the surviving files — the manifest-driven scan pattern
    that makes petabyte tables plannable.

    Scale posture: Iceberg WRITES these stats into manifest avro files
    at commit time; this table's commit log is minimal (dirs only), so
    the manifest is DERIVED by one distributed stats pass — a group-by
    on the file identity from ``_metadata`` whose partial aggregation
    is map-side (zero shuffle growth: output is files-sized, never
    rows-sized) and whose scan reads ONLY ``stat_cols`` (column
    pruning applies; pass few columns) — joined to a driver-side FILE
    LISTING (same files-sized I/O class as the commit log itself),
    which is what keeps zero-row part files in the manifest: they
    contribute no row to the stats pass but are still data files the
    total must count.  Derive once per snapshot and cache/persist the
    (tiny) result; the snapshot is immutable, so the manifest never
    goes stale."""
    reserved = {"commit_version", "batch_dir", "file_name",
                "size_bytes", "n_rows"}
    bad = sorted(set(stat_cols) & reserved)
    if bad:
        # the internal select would emit two columns with the same
        # name (AMBIGUOUS_REFERENCE at best, wrong binding at worst)
        # — refuse loudly (r13 review)
        raise ValueError(
            f"stat_cols {bad} collide with the manifest's own output "
            f"columns {sorted(reserved)}; rename or exclude them")
    dirs = _visible_dirs(path, version)
    # the file POPULATION comes from a driver-side listing (files-
    # sized, same I/O class as the commit log itself): a zero-row
    # part file contributes no row to the group-by below, so deriving
    # the population from row-level data would silently omit it and
    # undercount the snapshot's file total (r13 review)
    listing = spark.createDataFrame(
        [(int(d.rsplit("-", 1)[1]), d, fn,
          os.path.getsize(os.path.join(path, d, fn)))
         for d in dirs
         for fn in sorted(os.listdir(os.path.join(path, d)))
         if fn.endswith(".parquet")],
        "commit_version int, batch_dir string, file_name string, "
        "size_bytes long")
    df = spark.read.parquet(*[os.path.join(path, d) for d in dirs])
    # anchor the batch-dir extraction to the file's PARENT directory
    # segment — a first-match-anywhere regexp would mis-attribute every
    # file when the TABLE ROOT's path itself contains a batch-\d{8}
    # segment (e.g. a table nested under another table's batch dir)
    base = df.select(
        *[F.col(c) for c in stat_cols],
        F.regexp_extract(F.col("_metadata.file_path"),
                         rf"/({_BATCH_SEG})/[^/]+$", 1).alias("batch_dir"),
        F.col("_metadata.file_name").alias("file_name"))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"min_{c}"),
                 F.max(c).alias(f"max_{c}"),
                 F.sum(F.col(c).isNull().cast("long"))
                 .alias(f"nulls_{c}")]
    stats = base.groupBy("batch_dir", "file_name").agg(*aggs)
    # stats (files-sized) broadcasts as the build side of the left
    # join; zero-row files join to null stats → n_rows 0, null
    # bounds, 0 null-counts
    return (listing.join(F.broadcast(stats),
                         ["batch_dir", "file_name"], "left")
            .select(
                "commit_version", "batch_dir", "file_name",
                "size_bytes",
                F.coalesce("_n", F.lit(0).cast("long")).alias("n_rows"),
                *[F.coalesce(f"nulls_{c}", F.lit(0).cast("long"))
                  .alias(f"nulls_{c}") if p == "nulls"
                  else F.col(f"{p}_{c}")
                  for c in stat_cols
                  for p in ("min", "max", "nulls")]))


def plan_pruned_files(spark: SparkSession, path: str,
                      ranges: dict[str, tuple],
                      version: int | None = None
                      ) -> tuple[list[str], int]:
    """Plan a manifest-pruned scan: intersect inclusive range
    predicates with :func:`snapshot_manifest`'s per-file bounds and
    return ``(surviving file paths, total files in the snapshot)``.

    ``ranges`` maps column name → ``(lo, hi)`` (either side ``None``
    for open); the implied predicate is the conjunction of
    ``lo <= col <= hi``.  A column bounded on NEITHER side is no
    constraint at all — it prunes nothing and drops no rows (it is
    not null-rejecting, since no predicate is ever applied to it).
    A bounded column's file survives unless its bounds prove no row
    can match: ``min > hi``, ``max < lo``, or an all-null column
    (``min`` is ``None`` — a range predicate is null-rejecting, so
    an all-null file can never contribute a matching row).
    Pruning is CONSERVATIVE (bounds overlap does not imply a matching
    row); :func:`read_pruned` applies the residual filter for
    exactness — the same contract as Iceberg's scan planning
    (Apache Iceberg spec §Scan Planning: inclusive projection over
    ``lower_bounds``/``upper_bounds``).

    Scale posture: the manifest is FILES-sized, so collecting it to
    the driver to pick the file list is exactly what every Iceberg/
    Delta planner does — the data itself is never touched until the
    surviving files are scanned."""
    # only BOUNDED columns participate: an unconstrained (None, None)
    # column prunes nothing, is NOT null-rejecting (no predicate is
    # applied, so an all-null file stays), and must not widen the
    # stats scan's read schema either (r13 review, both halves)
    bounded = {c: b for c, b in ranges.items()
               if b[0] is not None or b[1] is not None}
    man = snapshot_manifest(spark, path, version,
                            stat_cols=tuple(bounded)).collect()
    kept = []
    for row in man:
        d = row.asDict()
        survives = True
        for c, (lo, hi) in bounded.items():
            mn, mx = d[f"min_{c}"], d[f"max_{c}"]
            if mn is None or (hi is not None and mn > hi) \
                    or (lo is not None and mx < lo):
                survives = False
                break
        if survives:
            kept.append(os.path.join(path, d["batch_dir"],
                                     d["file_name"]))
    return kept, len(man)


def read_pruned(spark: SparkSession, path: str,
                ranges: dict[str, tuple],
                version: int | None = None,
                plan: tuple[list[str], int] | None = None) -> DataFrame:
    """Read the snapshot at ``version`` through the manifest: plan the
    file list with :func:`plan_pruned_files`, scan ONLY the surviving
    files, and apply the range predicate as a residual row filter —
    the prune-before-read loop the manifest exists for.  On a table
    whose commits are range-clustered (each file covering a disjoint
    key slice), the scan's input-file list shrinks to the slices the
    predicate touches (pinned in tests/test_versioned.py via
    ``inputFiles()``); at 100 TB this is the difference between
    opening every footer and opening the files the query can actually
    match.  An empty survivor set returns an empty frame with the
    snapshot's schema.

    ``plan`` short-circuits the planning pass with a precomputed
    :func:`plan_pruned_files` result for the SAME (path, ranges,
    version) — the snapshot is immutable, so a caller that already
    planned (to log or certify the file counts) must not pay the
    manifest derivation twice (r13 review)."""
    kept, _total = plan if plan is not None \
        else plan_pruned_files(spark, path, ranges, version)
    residual = [cond
                for c, (lo, hi) in ranges.items()
                for cond in ((F.col(c) >= lo,) if lo is not None
                             else ())
                + ((F.col(c) <= hi,) if hi is not None else ())]
    if not kept:
        return spark.createDataFrame(
            [], read_version(spark, path, version).schema)
    df = spark.read.parquet(*kept)
    if residual:
        df = df.where(reduce(lambda a, b: a & b, residual))
    return df


def compact_snapshot(spark: SparkSession, path: str, target_rows: int,
                     max_concurrent_bins: int = 4
                     ) -> tuple[int, DataFrame]:
    """Small-file compaction EXECUTION (the Delta ``OPTIMIZE`` shape:
    Delta Lake docs §Optimize, Iceberg ``rewrite_data_files``): bin
    the LATEST snapshot's data files first-fit-decreasing by row
    count into ~``target_rows`` bins (:func:`plan_compaction` — the
    shared bin arithmetic, never a second copy), rewrite each bin as
    exactly ONE parquet file, and commit the rewrite as a new
    ``overwrite`` version.  Same rows, fewer files; every earlier
    version stays readable until vacuumed — compaction is a LAYOUT
    change, so time travel across it is exactly what the versioned
    log exists for.

    Returns ``(new_version, plan)`` where ``plan`` is the executed
    per-file relation ``(batch_dir, file_name, n_rows, file_seq, bin,
    bin_size, bin_files)``; output file ``bin-%05d.parquet`` in the
    new commit carries exactly its bin's ``bin_size`` rows.

    NO-OP detection (the r15 review): when the plan cannot reduce the
    file count — every bin holds exactly one file and the snapshot
    has no zero-row files to drop — NO commit is written and the
    CURRENT version is returned with the (unexecuted) plan, so a
    scheduled nightly compaction on an already-compact table costs
    one files-sized manifest pass instead of rewriting every byte
    and doubling the on-disk footprint until vacuum.

    Zero-row data files are DROPPED, not rewritten (they carry no
    rows; eliminating them is the point of compaction) — they appear
    in neither the plan nor the new commit.

    The commit records ``"compacted_from": <source_version>`` — the
    Delta ``dataChange=false`` marker: :func:`read_changes` skips
    compaction commits (a pure layout change adds no rows) instead
    of refusing the range the way it must for a true overwrite.

    Crash safety mirrors :func:`versioned_write`: bin files are
    staged inside the NEW batch directory (invisible — no commit
    references it) via per-bin ``_tmp-`` subdirs (underscore-prefixed,
    so even a direct read of the dir ignores them), and the log entry
    lands last via write-then-rename; a crash at any point leaves an
    orphan batch dir that :func:`find_orphans` reports and a retry
    reclaims with a fresh ``rmtree``.

    Scale posture: the plan is derived from the FILES-sized manifest
    (the only collect — what every Delta/Iceberg OPTIMIZE planner
    does); each bin rewrite is an independent ~target-sized job
    reading only its own files, submitted ``max_concurrent_bins`` at
    a time (Delta's OPTIMIZE executes exactly this way — parallel
    independent bin rewrites), so the rewrite I/O is proportional to
    the data compacted and never gated on a single serial pass."""
    from concurrent.futures import ThreadPoolExecutor

    from dynamic_partitioner_spark.operators.partitioned_write import (
        plan_compaction)
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    if max_concurrent_bins < 1:
        # validate BEFORE any filesystem mutation: ThreadPoolExecutor's
        # own error names no compact_snapshot parameter and would fire
        # only after the batch dir was created (r15 review)
        raise ValueError("max_concurrent_bins must be >= 1")
    _check_local(path)
    source_version = _require_commits(path)[-1]["version"]
    man = snapshot_manifest(spark, path, source_version)
    # one files-sized collect feeds BOTH the zero-row census and the
    # planner (over a local relation — the stats pass runs once)
    man_rows = man.collect()
    nonzero = [(r["batch_dir"], r["file_name"], r["n_rows"])
               for r in man_rows if r["n_rows"] > 0]
    if not nonzero:
        raise ValueError(
            f"nothing to compact under {path}: snapshot "
            f"{source_version} has no non-empty data files")
    plan = plan_compaction(
        spark.createDataFrame(
            nonzero,
            "batch_dir string, file_name string, n_rows long")
        .withColumn("_tbl", F.lit("t")),
        ["_tbl"], "n_rows", target_rows,
        tiebreak_cols=["batch_dir", "file_name"],
        carry_cols=["batch_dir", "file_name"])
    rows = plan.collect()  # files-sized
    out_cols = ["batch_dir", "file_name", "n_rows", "file_seq", "bin",
                "bin_size", "bin_files"]
    # materialize from the collected rows: the lazy plan would re-run
    # its window pass on every downstream use
    executed = spark.createDataFrame(
        [tuple(r[c] for c in out_cols) for r in rows],
        "batch_dir string, file_name string, n_rows long, "
        "file_seq int, bin long, bin_size long, bin_files long")
    n_bins = len({r["bin"] for r in rows})
    if n_bins == len(rows) and len(nonzero) == len(man_rows):
        # every bin holds exactly one file and there is nothing to
        # drop: rewriting would change no layout — return the current
        # version untouched (the no-op guard; r15 review)
        return source_version, executed
    version = source_version + 1
    batch = f"batch-{version:08d}"
    batch_full = os.path.join(path, batch)
    shutil.rmtree(batch_full, ignore_errors=True)  # reclaim a crashed try
    os.makedirs(batch_full)
    bins: dict[int, list[str]] = {}
    for r in rows:
        bins.setdefault(r["bin"], []).append(
            os.path.join(path, r["batch_dir"], r["file_name"]))

    def _rewrite(b: int) -> None:
        tmp = os.path.join(batch_full, f"_tmp-{b:05d}")
        # one task reads the whole ~target-sized bin and writes its
        # single output file — the bin IS the parallelism unit
        spark.read.parquet(*bins[b]).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        parts = [n for n in os.listdir(tmp) if n.endswith(".parquet")]
        if len(parts) != 1:
            raise RuntimeError(
                f"bin {b} rewrite produced {len(parts)} part files "
                f"(expected 1) under {tmp}")
        os.replace(os.path.join(tmp, parts[0]),
                   os.path.join(batch_full, f"bin-{b:05d}.parquet"))
        shutil.rmtree(tmp)

    with ThreadPoolExecutor(
            max_workers=min(max_concurrent_bins, len(bins))) as pool:
        # list() materializes to re-raise the first worker error
        list(pool.map(_rewrite, sorted(bins)))
    os.makedirs(_log_dir(path), exist_ok=True)
    _write_json_atomic(os.path.join(_log_dir(path), f"{version:08d}.json"),
                       {"version": version, "mode": "overwrite",
                        "dirs": [batch],
                        "compacted_from": source_version})
    return version, executed


def read_changes(spark: SparkSession, path: str, since_version: int,
                 to_version: int | None = None) -> DataFrame:
    """Incremental change feed (the Delta CDF / Iceberg incremental-
    scan shape): the rows APPENDED by commits in
    ``(since_version, to_version]``, each tagged with a
    ``_commit_version`` column — the primitive that lets a downstream
    pipeline process only what arrived since its last run instead of
    re-scanning the table.

    ``since_version=0`` means "from the beginning".  The range must
    not cross a TRUE ``overwrite`` commit: an overwrite REMOVES rows,
    and an append-only feed cannot represent removals — callers get a
    loud error telling them to re-snapshot via :func:`read_version`
    (exactly Delta's behavior for non-CDF tables).  COMPACTION
    commits (:func:`compact_snapshot`'s ``compacted_from`` marker)
    are exempt: they rewrite layout, not rows, so the feed skips them
    silently — Delta CDF's ``dataChange=false`` treatment of
    OPTIMIZE.  Vacuumed commits in the range also refuse loudly.  An
    empty range returns an empty frame with the table schema.

    Scale posture: the commits in range are read directly (one
    parquet scan per batch dir, unioned) — cost is proportional to
    the CHANGE volume, never the table size, and pruning/pushdown
    apply per branch."""
    _check_local(path)
    commits = _require_commits(path)
    latest = commits[-1]["version"]
    if to_version is None:
        to_version = latest
    if not 0 <= since_version <= to_version <= latest:
        raise ValueError(
            f"bad change range ({since_version}, {to_version}]: "
            f"need 0 <= since <= to <= {latest}")
    # compaction commits are pure LAYOUT changes — the row multiset is
    # identical before and after (compact_snapshot certifies it), so
    # the feed skips them exactly like Delta CDF treats OPTIMIZE
    # (dataChange=false); only a TRUE overwrite removes rows and
    # breaks an append-only feed (r15 review: before this, any
    # nightly compaction hard-failed every incremental consumer).
    # Filter them BEFORE the vacuum check: a vacuumed compaction
    # commit's dirs are never read by the feed, so refusing the range
    # for it would be a false refusal of a fully representable answer
    # (r15 review — the old order did exactly that)
    sel = [c for c in commits
           if since_version < c["version"] <= to_version
           and "compacted_from" not in c]
    floor = _vacuum_floor(path)
    gone = [c["version"] for c in sel if c["version"] < floor]
    if gone:
        raise ValueError(
            f"commit(s) {gone} in the change range were vacuumed "
            f"(retention floor is {floor})")
    ow = [c["version"] for c in sel if c["mode"] == "overwrite"]
    if ow:
        raise ValueError(
            f"change feed undefined across overwrite commit(s) {ow}: "
            "an append-only feed cannot represent removed rows — "
            "re-snapshot with read_version instead")
    if not sel:
        # schema from the LATEST snapshot: to_version may be 0 or
        # below the vacuum floor, both unreadable as snapshots
        return (read_version(spark, path, latest).limit(0)
                .withColumn("_commit_version", F.lit(0).cast("long")))
    parts = [
        spark.read.parquet(*[os.path.join(path, d) for d in c["dirs"]])
        .withColumn("_commit_version",
                    F.lit(c["version"]).cast("long"))
        for c in sel]
    return reduce(lambda a, b: a.unionByName(b), parts)


def _vacuum_floor(path: str) -> int:
    marker = os.path.join(_log_dir(path), "_vacuum.json")
    if not os.path.exists(marker):
        return 1
    with open(marker) as fh:
        return int(json.load(fh)["floor"])


def vacuum_versions(spark: SparkSession, path: str,
                    keep_from: int) -> DataFrame:
    """Retention enforcement (the Delta/Iceberg VACUUM shape): delete
    every batch directory invisible to ALL versions >= ``keep_from``
    and floor time travel there, returning a per-commit audit report
    ``(version, mode, action, n_rows)`` computed BEFORE deletion.

    Which dirs survive: the visible set of any version v is "commits
    since the last overwrite at-or-before v", so the union over
    v >= keep_from is exactly the commits with version >= L where L
    is the last overwrite at-or-before ``keep_from`` (1 if none) —
    appends before an un-overwritten history stay live forever, which
    is correct: they are still visible.  The floor is recorded in the
    log (write-then-rename like commits) and :func:`read_version`
    refuses vacuumed versions loudly rather than returning partial
    data from surviving dirs.

    This is an eager maintenance ACTION (like the write operators),
    not a lazy query: deletion happens before return."""
    _check_local(path)
    commits = _require_commits(path)
    latest = commits[-1]["version"]
    if not 1 <= keep_from <= latest:
        raise ValueError(
            f"keep_from {keep_from} outside 1..{latest}")
    prior_floor = _vacuum_floor(path)
    if keep_from < prior_floor:
        # a lower keep_from cannot restore already-deleted batches; it
        # would only produce an audit report labeling unreadable
        # commits "kept" — refuse loudly instead
        raise ValueError(
            f"keep_from {keep_from} is below the existing retention "
            f"floor {prior_floor}; versions < {prior_floor} are "
            f"already vacuumed")
    last_ow = max((c["version"] for c in commits
                   if c["mode"] == "overwrite"
                   and c["version"] <= keep_from), default=1)
    # audit counts are metadata-cheap: count() over parquet plans an
    # empty projection (ReadSchema struct<>), so only footers/row-
    # group metadata are read, never data pages — the report costs
    # one small job per commit dir, not a table scan
    report = []
    for c in commits:
        action = "deleted" if c["version"] < last_ow else "kept"
        n = 0
        for d in c["dirs"]:
            full = os.path.join(path, d)
            if os.path.isdir(full):
                n += spark.read.parquet(full).count()
        report.append((c["version"], c["mode"], action, n))
    # floor FIRST, then delete: a crash mid-rmtree must leave the
    # half-deleted version REFUSING loudly (floor already advanced),
    # never serving partial rows from a gutted dir — and a re-vacuum
    # at the same keep_from is allowed (not < floor) and finishes the
    # deletes (r13 review: the old delete-then-floor order had
    # exactly the silent-partial-read window this module promises
    # not to have)
    floor = max(last_ow, prior_floor)
    _write_json_atomic(os.path.join(_log_dir(path), "_vacuum.json"),
                       {"floor": floor})
    for c in commits:
        if c["version"] < last_ow:
            for d in c["dirs"]:
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return spark.createDataFrame(
        report, "version long, mode string, action string, n_rows long")


def find_orphans(spark: SparkSession, path: str) -> DataFrame:
    """Orphan-directory audit: top-level data directories present on
    disk but referenced by NO commit — exactly what a writer crash
    between the batch write and the log rename leaves behind (see
    :func:`versioned_write`'s overwrite-not-error note), plus any
    foreign debris dropped into the table root.  The vacuum-planning
    primitive: production lakehouses run this before reclaiming space
    (Delta VACUUM's untracked-file scan, Iceberg's
    ``remove_orphan_files``).

    Returns one row per orphan: ``(orphan_dir, n_rows,
    version_shaped)`` — ``n_rows`` from reading the stray parquet
    (0 for an unreadable/empty dir), ``version_shaped`` whether the
    name matches the engine's own ``batch-XXXXXXXX`` pattern (a
    crashed write of THIS engine, recoverable by re-commit) or not
    (foreign debris, delete-only).  Cost is one driver listing plus a
    footer read per orphan — metadata-scale, never a table scan; the
    commit log is bytes per commit by design.
    """
    _check_local(path)
    rows = []
    for name in unreferenced_dirs(path):
        try:
            n = spark.read.parquet(os.path.join(path, name)).count()
        except Exception:
            n = 0
        rows.append((name, n, is_batch_shaped(name)))
    return spark.createDataFrame(
        rows, "orphan_dir string, n_rows long, version_shaped boolean")


def is_batch_shaped(name: str) -> bool:
    """Whether a directory name matches the engine's own batch-dir
    pattern (a crashed write of THIS engine, recoverable by
    re-commit) — the single authority for the pattern (``_BATCH_SEG``),
    shared with the bench harness's writer-debris canary and the
    manifest's file→dir attribution."""
    import re as _re
    return bool(_re.fullmatch(_BATCH_SEG, name))


def unreferenced_dirs(path: str) -> list[str]:
    """Top-level data dirs present on disk but referenced by NO
    commit — the pure-python commit-log contract behind
    :func:`find_orphans`, shared with ``bench.sweep_writer_debris``
    (r10 review: a second hand-rolled copy of the log schema would
    silently report every healthy batch as debris if the commit
    format ever changed)."""
    referenced = {d for c in _commits(path) for d in c["dirs"]}
    try:
        entries = sorted(os.listdir(path))
    except FileNotFoundError:
        return []
    return [name for name in entries
            if name != "_log"
            and os.path.isdir(os.path.join(path, name))
            and name not in referenced]
