"""Snapshot-versioned table (JSON commit log + plain parquet)."""

from __future__ import annotations

import pytest

from dynamic_partitioner_spark.operators.versioned import (
    read_version,
    versioned_write,
)


def _ids(df):
    return {r.id for r in df.collect()}


def test_append_accumulates_and_versions_stay_readable(spark, tmp_path):
    p = str(tmp_path / "t")
    a = spark.createDataFrame([(1,), (2,)], "id long")
    b = spark.createDataFrame([(3,)], "id long")
    assert versioned_write(a, p) == 1
    assert versioned_write(b, p) == 2
    assert _ids(read_version(spark, p, 1)) == {1, 2}
    assert _ids(read_version(spark, p, 2)) == {1, 2, 3}
    assert _ids(read_version(spark, p)) == {1, 2, 3}


def test_overwrite_resets_visible_set_but_not_history(spark, tmp_path):
    p = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1,)], "id long"), p)
    versioned_write(spark.createDataFrame([(9,)], "id long"), p,
                    mode="overwrite")
    versioned_write(spark.createDataFrame([(10,)], "id long"), p)
    assert _ids(read_version(spark, p, 1)) == {1}
    assert _ids(read_version(spark, p, 2)) == {9}
    assert _ids(read_version(spark, p, 3)) == {9, 10}


def test_bad_versions_and_modes_raise(spark, tmp_path):
    p = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        read_version(spark, p)
    versioned_write(spark.createDataFrame([(1,)], "id long"), p)
    with pytest.raises(ValueError):
        read_version(spark, p, 99)
    with pytest.raises(ValueError):
        read_version(spark, p, 0)
    with pytest.raises(ValueError):
        versioned_write(spark.createDataFrame([(1,)], "id long"), p,
                        mode="error_if_exists")


def test_remote_paths_rejected_loudly(spark):
    with pytest.raises(ValueError, match="local paths only"):
        versioned_write(spark.createDataFrame([(1,)], "id long"),
                        "s3a://bucket/t")
    with pytest.raises(ValueError, match="local paths only"):
        read_version(spark, "hdfs://nn/t")


def test_orphan_batch_dir_is_reclaimed_after_crash(spark, tmp_path):
    """A crash between the batch write and the log rename leaves an
    uncommitted batch dir; the retry must reclaim it, not wedge."""
    p = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1,)], "id long"), p)
    # simulate the torn second commit: data written, log never published
    spark.createDataFrame([(999,)], "id long") \
        .write.parquet(f"{p}/batch-00000002")
    v = versioned_write(spark.createDataFrame([(2,)], "id long"), p)
    assert v == 2
    assert _ids(read_version(spark, p)) == {1, 2}  # orphan row gone


def test_vacuum_deletes_invisible_and_floors_time_travel(spark, tmp_path):
    import pytest

    from dynamic_partitioner_spark.operators.versioned import (
        read_version, vacuum_versions, versioned_write)
    path = str(tmp_path / "vt")
    mk = lambda lo, hi: spark.range(lo, hi).toDF("id")
    assert versioned_write(mk(0, 5), path, "append") == 1
    assert versioned_write(mk(5, 8), path, "append") == 2
    assert versioned_write(mk(100, 104), path, "overwrite") == 3
    assert versioned_write(mk(104, 110), path, "append") == 4
    rep = {r.version: (r.action, r.n_rows)
           for r in vacuum_versions(spark, path, keep_from=3).collect()}
    assert rep == {1: ("deleted", 5), 2: ("deleted", 3),
                   3: ("kept", 4), 4: ("kept", 6)}
    # retained versions still read exactly
    assert read_version(spark, path, 4).count() == 10
    assert read_version(spark, path, 3).count() == 4
    # vacuumed versions refuse loudly — never partial data
    with pytest.raises(ValueError, match="vacuumed"):
        read_version(spark, path, 2)
    # idempotent: re-vacuum reports already-deleted commits with 0 rows
    rep2 = {r.version: (r.action, r.n_rows)
            for r in vacuum_versions(spark, path, keep_from=3).collect()}
    assert rep2[1] == ("deleted", 0)
    assert rep2[3] == ("kept", 4)
    # re-vacuum BELOW the recorded floor refuses loudly: it cannot
    # restore deleted batches, and labeling unreadable commits "kept"
    # would contradict the table state
    with pytest.raises(ValueError, match="retention floor"):
        vacuum_versions(spark, path, keep_from=2)


def test_read_changes_feed_and_refusals(spark, tmp_path):
    import pytest

    from dynamic_partitioner_spark.operators.versioned import (
        read_changes, vacuum_versions, versioned_write)
    path = str(tmp_path / "cf")
    mk = lambda lo, hi: spark.range(lo, hi).toDF("id")
    versioned_write(mk(0, 3), path, "append")       # v1
    versioned_write(mk(3, 5), path, "append")       # v2
    versioned_write(mk(5, 9), path, "append")       # v3
    # changes since v1 = commits 2 and 3, tagged with their versions
    ch = {(r.id, r._commit_version)
          for r in read_changes(spark, path, since_version=1).collect()}
    assert ch == {(3, 2), (4, 2), (5, 3), (6, 3), (7, 3), (8, 3)}
    # bounded upper end
    assert read_changes(spark, path, 1, to_version=2).count() == 2
    # empty range: 0 rows, schema = table schema + _commit_version
    empty = read_changes(spark, path, 3)
    assert empty.count() == 0
    assert empty.columns == ["id", "_commit_version"]
    # full history from the beginning
    assert read_changes(spark, path, 0).count() == 9
    # crossing an overwrite refuses loudly — removals have no feed rows
    versioned_write(mk(100, 102), path, "overwrite")  # v4
    with pytest.raises(ValueError, match="overwrite"):
        read_changes(spark, path, since_version=2)
    # after the overwrite, the feed works again
    versioned_write(mk(102, 103), path, "append")     # v5
    assert {r.id for r in read_changes(spark, path, 4).collect()} == {102}
    # vacuumed commits in range refuse loudly
    vacuum_versions(spark, path, keep_from=4)
    with pytest.raises(ValueError, match="vacuumed"):
        read_changes(spark, path, 1, to_version=3)
    # bad ranges refuse
    with pytest.raises(ValueError, match="change range"):
        read_changes(spark, path, 3, to_version=2)


def test_vacuum_without_overwrite_keeps_everything(spark, tmp_path):
    from dynamic_partitioner_spark.operators.versioned import (
        read_version, vacuum_versions, versioned_write)
    path = str(tmp_path / "vt2")
    versioned_write(spark.range(3).toDF("id"), path, "append")
    versioned_write(spark.range(3, 7).toDF("id"), path, "append")
    rep = {r.version: r.action
           for r in vacuum_versions(spark, path, keep_from=2).collect()}
    # appends are still visible to version 2 — nothing is deletable
    assert rep == {1: "kept", 2: "kept"}
    assert read_version(spark, path, 1).count() == 3


def test_find_orphans_flags_only_unreferenced_dirs(spark, tmp_path):
    from dynamic_partitioner_spark.operators.versioned import (
        find_orphans, versioned_write)
    path = str(tmp_path / "vt")
    df = spark.range(10).withColumnRenamed("id", "k")
    versioned_write(df, path, "append")
    versioned_write(df.where("k < 3"), path, "append")
    # clean table: no orphans
    assert find_orphans(spark, path).count() == 0
    # crashed write (engine-shaped, no commit) + foreign debris
    df.where("k < 5").write.mode("overwrite").parquet(
        f"{path}/batch-00000042")
    df.where("k < 2").write.mode("overwrite").parquet(
        f"{path}/not-a-batch")
    got = {(r.orphan_dir, r.n_rows, r.version_shaped)
           for r in find_orphans(spark, path).collect()}
    assert got == {("batch-00000042", 5, True),
                   ("not-a-batch", 2, False)}
    # committed dirs never flagged even after more commits
    versioned_write(df.where("k >= 8"), path, "overwrite")
    assert find_orphans(spark, path).count() == 2


def test_snapshot_manifest_bounds_and_time_travel(spark, tmp_path):
    """Manifest rows carry the per-file pruning metadata for exactly
    the requested snapshot's visible set: an overwrite drops earlier
    commits from the latest manifest but time travel still lists
    them; bounds/null counts are the true file aggregates."""
    import pyspark.sql.functions as F

    from dynamic_partitioner_spark.operators.versioned import (
        snapshot_manifest, versioned_write)
    path = str(tmp_path / "vt")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") * 2).alias("v"))
    versioned_write(df.where("k < 40").coalesce(1), path, "append")
    versioned_write(df.where("k >= 40").coalesce(1), path, "append")
    versioned_write(df.where("k < 5").coalesce(1), path, "overwrite")

    latest = snapshot_manifest(spark, path, stat_cols=("k", "v"))
    rows = {r.commit_version: r for r in latest.collect()}
    assert set(rows) == {3}, "overwrite must hide commits 1-2"
    r = rows[3]
    assert (r.n_rows, r.min_k, r.max_k) == (5, 0, 4)
    assert (r.min_v, r.max_v, r.nulls_v) == (2, 8, 1)  # k=0 -> null v
    assert r.batch_dir == "batch-00000003"
    assert r.size_bytes > 0 and r.file_name.endswith(".parquet")

    asof = snapshot_manifest(spark, path, version=2, stat_cols=("k",))
    rows2 = {r.commit_version: r for r in asof.collect()}
    assert set(rows2) == {1, 2}
    assert (rows2[1].min_k, rows2[1].max_k, rows2[1].n_rows) == (0, 39, 40)
    assert (rows2[2].min_k, rows2[2].max_k, rows2[2].n_rows) == (40, 99, 60)


def test_snapshot_manifest_multi_file_commit(spark, tmp_path):
    """A commit written as several files yields several manifest rows
    that partition the commit: counts sum to the slice, per-file
    bounds nest inside the commit bounds, file names are distinct."""
    from dynamic_partitioner_spark.operators.versioned import (
        snapshot_manifest, versioned_write)
    path = str(tmp_path / "vt")
    df = spark.range(1000).withColumnRenamed("id", "k")
    versioned_write(df.repartition(4), path, "append")
    man = snapshot_manifest(spark, path, stat_cols=("k",)).collect()
    assert len(man) == 4
    assert sum(r.n_rows for r in man) == 1000
    assert len({r.file_name for r in man}) == 4
    assert all(r.commit_version == 1 for r in man)
    assert min(r.min_k for r in man) == 0
    assert max(r.max_k for r in man) == 999
    # bounds containment, explicit per file (r12 VERDICT #5): every
    # file's [min, max] interval nests inside the commit's bounds and
    # is itself well-ordered — the invariant pruning relies on
    assert all(0 <= r.min_k <= r.max_k <= 999 for r in man)
    assert all(r.nulls_k == 0 for r in man)


def test_snapshot_manifest_validation_matches_read_version(spark, tmp_path):
    """The manifest shares read_version's snapshot validation: absent
    versions and vacuumed versions refuse loudly."""
    import pytest

    from dynamic_partitioner_spark.operators.versioned import (
        snapshot_manifest, vacuum_versions, versioned_write)
    path = str(tmp_path / "vt")
    df = spark.range(10).withColumnRenamed("id", "k")
    versioned_write(df, path, "append")
    versioned_write(df, path, "overwrite")
    with pytest.raises(ValueError, match="does not exist"):
        snapshot_manifest(spark, path, version=9)
    vacuum_versions(spark, path, keep_from=2)
    with pytest.raises(ValueError, match="vacuumed"):
        snapshot_manifest(spark, path, version=1)


def test_snapshot_manifest_table_rooted_under_batchlike_dir(spark, tmp_path):
    """Commit attribution must come from the file's PARENT dir, not the
    first batch-like segment anywhere in the path (r12 review): a table
    rooted under a directory named like a batch dir must still
    attribute files to their real commits."""
    from dynamic_partitioner_spark.operators.versioned import (
        snapshot_manifest, versioned_write)
    path = str(tmp_path / "batch-00000099" / "vt")
    df = spark.range(10).withColumnRenamed("id", "k")
    versioned_write(df.coalesce(1), path, "append")
    versioned_write(df.coalesce(1), path, "append")
    man = snapshot_manifest(spark, path, stat_cols=("k",)).collect()
    assert {r.commit_version for r in man} == {1, 2}
    assert {r.batch_dir for r in man} == {"batch-00000001",
                                          "batch-00000002"}


def _clustered_table(spark, tmp_path, name="vt"):
    """Three append commits over disjoint 100-key slices, one file
    each — the range-clustered layout manifest pruning exists for."""
    from dynamic_partitioner_spark.operators.versioned import (
        versioned_write)
    path = str(tmp_path / name)
    for lo in (0, 100, 200):
        versioned_write(
            spark.range(lo, lo + 100).withColumnRenamed("id", "k")
            .coalesce(1), path, "append")
    return path


def test_read_pruned_scans_strictly_fewer_files(spark, tmp_path):
    """The Iceberg prune-before-read loop (r12 VERDICT next-tranche
    (a)): a predicate that touches one key slice plans a scan over
    ONLY that slice's file — asserted on the PLAN via inputFiles(),
    not just the row values."""
    from dynamic_partitioner_spark.operators.versioned import (
        plan_pruned_files, read_pruned, read_version)
    path = _clustered_table(spark, tmp_path)
    kept, total = plan_pruned_files(spark, path, {"k": (120, 130)})
    assert total == 3 and len(kept) == 1
    df = read_pruned(spark, path, {"k": (120, 130)})
    full = read_version(spark, path)
    assert set(df.inputFiles()) < set(full.inputFiles())
    assert len(df.inputFiles()) == 1
    assert {r.k for r in df.collect()} == set(range(120, 131))


def test_read_pruned_residual_filter_and_open_ranges(spark, tmp_path):
    """Bounds pruning is conservative — a surviving file still holds
    rows outside the range, and the residual filter must drop them.
    Open-ended ranges (lo or hi None) prune on the bounded side
    only."""
    from dynamic_partitioner_spark.operators.versioned import (
        read_pruned)
    path = _clustered_table(spark, tmp_path)
    df = read_pruned(spark, path, {"k": (None, 150)})
    assert len(df.inputFiles()) == 2  # slice [200,300) pruned
    assert {r.k for r in df.collect()} == set(range(0, 151))
    df = read_pruned(spark, path, {"k": (250, None)})
    assert len(df.inputFiles()) == 1
    assert {r.k for r in df.collect()} == set(range(250, 300))


def test_read_pruned_time_travel_and_empty_survivors(spark, tmp_path):
    """Pruning composes with time travel (the snapshot's visible set
    is what gets pruned), and an empty survivor set returns an empty
    frame that keeps the snapshot schema."""
    from dynamic_partitioner_spark.operators.versioned import (
        read_pruned)
    path = _clustered_table(spark, tmp_path)
    # at version 2 the [200,300) slice does not exist yet
    df = read_pruned(spark, path, {"k": (250, None)}, version=2)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k"]
    # latest version, range beyond every bound
    df = read_pruned(spark, path, {"k": (1000, 2000)})
    assert df.count() == 0


def test_read_pruned_drops_all_null_files(spark, tmp_path):
    """A file whose stat column is entirely null can never satisfy a
    range predicate (range predicates are null-rejecting) — it must be
    pruned, not scanned."""
    from dynamic_partitioner_spark.operators.versioned import (
        plan_pruned_files, read_pruned, versioned_write)
    path = str(tmp_path / "vt")
    versioned_write(spark.range(5).withColumnRenamed("id", "k")
                    .coalesce(1), path, "append")
    versioned_write(
        spark.createDataFrame([(None,), (None,)], "k long").coalesce(1),
        path, "append")
    kept, total = plan_pruned_files(spark, path, {"k": (0, 10)})
    assert total == 2 and len(kept) == 1
    assert {r.k for r in read_pruned(spark, path, {"k": (0, 10)})
            .collect()} == {0, 1, 2, 3, 4}


def test_read_pruned_multi_column_conjunction(spark, tmp_path):
    """Ranges over TWO columns prune as a conjunction: a file survives
    only if EVERY column's bounds intersect its range — one column's
    miss is enough to drop the file."""
    from dynamic_partitioner_spark.operators.versioned import (
        plan_pruned_files, read_pruned, versioned_write)
    path = str(tmp_path / "vt")
    # two commits: k in [0,100) with g=0, k in [100,200) with g=1
    for lo, g in ((0, 0), (100, 1)):
        versioned_write(
            spark.range(lo, lo + 100).withColumnRenamed("id", "k")
            .selectExpr("k", f"{g}L as g").coalesce(1), path, "append")
    # k-range matches BOTH files' [0,200) span, g-range only file 2
    kept, total = plan_pruned_files(
        spark, path, {"k": (50, 150), "g": (1, 1)})
    assert total == 2 and len(kept) == 1
    rows = {(r.k, r.g)
            for r in read_pruned(spark, path,
                                 {"k": (50, 150), "g": (1, 1)})
            .collect()}
    assert rows == {(k, 1) for k in range(100, 151)}


def test_read_pruned_equals_filtered_read_over_predicate_grid(
        spark, tmp_path):
    """Equivalence property over a seeded predicate grid: for every
    (lo, hi) range — open, closed, empty, partial, spanning — the
    pruned read's multiset equals the plain snapshot read filtered
    row-wise.  This is the contract that makes pruning SAFE to apply
    blindly at 100 TB: it may only skip files, never rows."""
    from dynamic_partitioner_spark.operators.versioned import (
        read_pruned, read_version)
    path = _clustered_table(spark, tmp_path)
    full = sorted(r.k for r in read_version(spark, path).collect())
    grid = [(None, None), (None, -1), (300, None), (0, 299),
            (0, 0), (299, 299), (150, 150), (99, 100), (100, 199),
            (95, 205), (None, 42), (250, None), (180, 120)]
    for lo, hi in grid:
        got = sorted(r.k for r in
                     read_pruned(spark, path, {"k": (lo, hi)})
                     .collect())
        want = [k for k in full
                if (lo is None or k >= lo) and (hi is None or k <= hi)]
        assert got == want, f"range ({lo}, {hi})"


def test_read_pruned_open_range_keeps_all_null_files(spark, tmp_path):
    """r13 review: a column bounded on NEITHER side is no constraint —
    it must not drop the all-null file (no predicate is ever applied,
    so nothing is null-rejecting), or file-skipping loses rows the
    residual filter would keep."""
    from dynamic_partitioner_spark.operators.versioned import (
        plan_pruned_files, read_pruned, versioned_write)
    path = str(tmp_path / "vt")
    versioned_write(spark.range(3).withColumnRenamed("id", "k")
                    .coalesce(1), path, "append")
    versioned_write(
        spark.createDataFrame([(None,), (None,)], "k long").coalesce(1),
        path, "append")
    kept, total = plan_pruned_files(spark, path, {"k": (None, None)})
    assert total == 2 and len(kept) == 2
    got = [r.k for r in read_pruned(spark, path, {"k": (None, None)})
           .collect()]
    assert sorted(x for x in got if x is not None) == [0, 1, 2]
    assert got.count(None) == 2
    # a precomputed plan short-circuits planning and reads the same
    got2 = read_pruned(spark, path, {"k": (None, None)},
                       plan=(kept, total))
    assert got2.count() == 5


def test_snapshot_manifest_includes_zero_row_files(spark, tmp_path):
    """r13 review: a zero-row part file contributes no row to the
    stats pass, but it IS a data file — the manifest must list it
    (n_rows 0, null bounds, 0 null-counts) and plan_pruned_files'
    total must count it.  A bounded range prunes it (no row can
    match); a fully-open range keeps it (harmless, costless)."""
    from dynamic_partitioner_spark.operators.versioned import (
        plan_pruned_files, snapshot_manifest, versioned_write)
    path = str(tmp_path / "vt")
    versioned_write(spark.range(5).withColumnRenamed("id", "k")
                    .coalesce(1), path, "append")
    empty = spark.createDataFrame([], "k long").coalesce(1)
    versioned_write(empty, path, "append")
    man = {r.commit_version: r
           for r in snapshot_manifest(spark, path,
                                      stat_cols=("k",)).collect()}
    assert set(man) == {1, 2}
    assert (man[2].n_rows, man[2].min_k, man[2].max_k,
            man[2].nulls_k) == (0, None, None, 0)
    assert man[2].size_bytes > 0  # parquet footer exists
    assert man[1].n_rows == 5
    kept, total = plan_pruned_files(spark, path, {"k": (0, 10)})
    assert total == 2 and len(kept) == 1       # bounded: pruned
    kept, total = plan_pruned_files(spark, path, {"k": (None, None)})
    assert total == 2 and len(kept) == 2       # open: kept


def test_snapshot_manifest_rejects_reserved_stat_cols(spark, tmp_path):
    """A stat column named like a manifest output column would emit an
    ambiguous reference — refused loudly instead (r13 review)."""
    from dynamic_partitioner_spark.operators.versioned import (
        snapshot_manifest, versioned_write)
    path = str(tmp_path / "vt")
    versioned_write(spark.range(3).selectExpr("id as k",
                                              "id as n_rows"),
                    path, "append")
    with pytest.raises(ValueError, match="collide"):
        snapshot_manifest(spark, path, stat_cols=("n_rows",))


def test_vacuum_floors_before_deleting(spark, tmp_path, monkeypatch):
    """Crash-window pin (r13 review): the retention floor must be
    persisted BEFORE any rmtree, so a crash mid-deletion leaves the
    half-deleted version refusing loudly — never serving partial rows
    from a gutted dir.  A re-vacuum at the same keep_from then
    finishes the deletes."""
    from dynamic_partitioner_spark.operators import versioned as V
    path = str(tmp_path / "vt")
    V.versioned_write(spark.range(5).toDF("id"), path, "append")
    V.versioned_write(spark.range(5, 8).toDF("id"), path, "overwrite")

    def boom(*a, **k):
        raise OSError("disk died mid-delete")
    monkeypatch.setattr(V.shutil, "rmtree", boom)
    with pytest.raises(OSError, match="mid-delete"):
        V.vacuum_versions(spark, path, keep_from=2)
    monkeypatch.undo()
    # the floor advanced BEFORE the failed delete: v1 refuses loudly
    # even though its dir still (partially) exists on disk
    assert V._vacuum_floor(path) == 2
    with pytest.raises(ValueError, match="vacuumed"):
        V.read_version(spark, path, 1)
    # re-vacuum at the same keep_from completes the deletion
    rep = {r.version: r.action
           for r in V.vacuum_versions(spark, path, keep_from=2)
           .collect()}
    assert rep == {1: "deleted", 2: "kept"}
    import os as _os
    assert not _os.path.isdir(_os.path.join(path, "batch-00000001"))
    assert V.read_version(spark, path, 2).count() == 3


def test_zorder_slab_pruning_beats_1d_sort_on_2d_predicate(
        spark, tmp_path):
    """r14 tranche pin (multi-dimension manifest pruning over Z-order
    envelopes): the SAME 256-cell (x, y) grid committed two ways —
    four z-SLAB commits (each file an 8x8 Morton quadrant) and four
    x-SLICE commits (each file 4 x-values spanning ALL of y).  An
    x-AND-y range predicate scans STRICTLY fewer files on the
    z-clustered table: its per-file y envelopes are tight, the 1-d
    sort's span the whole domain.  A y-only predicate prunes half the
    z-table and NOTHING on the x-sorted one."""
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.functions.zorder import zorder_key
    from dynamic_partitioner_spark.operators.versioned import (
        plan_pruned_files, read_pruned, versioned_write)

    grid = (spark.range(256)
            .select((F.col("id") % 16).alias("xb"),
                    (F.col("id") / 16).cast("long").alias("yb"))
            .withColumn("zval", zorder_key(["xb", "yb"], bits=4)))
    pz, px = str(tmp_path / "z"), str(tmp_path / "x")
    for k in range(4):
        versioned_write(grid.where(F.col("zval")
                                   .between(64 * k, 64 * k + 63))
                        .coalesce(1), pz)
        versioned_write(grid.where(F.expr("xb div 4") == k)
                        .coalesce(1), px)
    xy = {"xb": (0, 7), "yb": (0, 7)}
    kept_z, tot_z = plan_pruned_files(spark, pz, xy)
    kept_x, tot_x = plan_pruned_files(spark, px, xy)
    assert tot_z == tot_x == 4
    assert len(kept_z) == 1 and len(kept_x) == 2
    assert len(kept_z) < len(kept_x)            # the tranche claim
    # y-only: halves the z scan, prunes nothing on the 1-d x sort
    kept_zy, _ = plan_pruned_files(spark, pz, {"yb": (0, 7)})
    kept_xy_only, _ = plan_pruned_files(spark, px, {"yb": (0, 7)})
    assert len(kept_zy) == 2 and len(kept_xy_only) == 4
    # row exactness: both layouts' pruned reads agree with the truth
    want = {(x, y) for x in range(8) for y in range(8)}
    for p in (pz, px):
        got = {(r.xb, r.yb) for r in read_pruned(spark, p, xy)
               .select("xb", "yb").collect()}
        assert got == want


def test_commits_order_numerically_and_skip_non_digit_names(tmp_path):
    """r13 review: lexical filename sort breaks at the 9th digit
    (100000000.json < 99999999.json); _commits orders by the parsed
    version and ignores non-digit .json debris."""
    import json as _json
    import os as _os

    from dynamic_partitioner_spark.operators.versioned import _commits
    ld = tmp_path / "t" / "_log"
    ld.mkdir(parents=True)
    for v in (99999999, 100000000, 1):
        (ld / f"{v:08d}.json").write_text(
            _json.dumps({"version": v, "mode": "append",
                         "dirs": [f"batch-{v:08d}"]}))
    (ld / "notes.json").write_text("{}")       # debris: ignored
    got = [c["version"] for c in _commits(str(tmp_path / "t"))]
    assert got == [1, 99999999, 100000000]


def test_compact_snapshot_fewer_files_same_rows(spark, tmp_path):
    """The Delta OPTIMIZE shape (r15 roadmap tranche): post-compaction
    file count equals the plan's bin count, each output file carries
    exactly its bin's rows, total rows are conserved, and the
    PRE-compaction snapshot still reads unchanged (time travel across
    a layout change is the point of the versioned log)."""
    import os as _os

    from dynamic_partitioner_spark.operators.versioned import (
        compact_snapshot, snapshot_manifest)
    p = str(tmp_path / "t")
    # five single-file appends with known sizes 40/30/20/10/5
    for i, n in enumerate((40, 30, 20, 10, 5)):
        versioned_write(
            spark.range(100 * i, 100 * i + n)
            .selectExpr("id", "id * 2 AS v").coalesce(1), p)
    pre = read_version(spark, p, 5)
    pre_rows = sorted((r.id, r.v) for r in pre.collect())
    v, plan = compact_snapshot(spark, p, target_rows=50)
    assert v == 6
    bins = {r.bin: (r.bin_size, r.bin_files) for r in plan.collect()}
    # FFD desc: 40,30 -> cum 0,40 bins 0,0; 20 cum 70 -> bin 1;
    # 10 cum 90 -> bin 1; 5 cum 100 -> bin 2
    assert bins == {0: (70, 2), 1: (30, 2), 2: (5, 1)}
    batch = _os.path.join(p, "batch-00000006")
    files = sorted(n for n in _os.listdir(batch)
                   if n.endswith(".parquet"))
    assert files == ["bin-00000.parquet", "bin-00001.parquet",
                     "bin-00002.parquet"]
    man = {r.file_name: r.n_rows
           for r in snapshot_manifest(spark, p, v).collect()}
    assert man == {"bin-00000.parquet": 70, "bin-00001.parquet": 30,
                   "bin-00002.parquet": 5}
    # rows conserved, and the pre-compaction snapshot is untouched
    post_rows = sorted((r.id, r.v)
                       for r in read_version(spark, p, v).collect())
    assert post_rows == pre_rows
    assert sorted((r.id, r.v)
                  for r in read_version(spark, p, 5).collect()) \
        == pre_rows


def test_compact_snapshot_drops_zero_row_files_and_validates(
        spark, tmp_path):
    """Zero-row data files are eliminated (not rewritten); bad target
    and empty tables refuse loudly; a crashed prior attempt's batch
    dir is reclaimed."""
    import os as _os

    from dynamic_partitioner_spark.operators.versioned import (
        compact_snapshot)
    p = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        compact_snapshot(spark, p, 10)
    versioned_write(spark.range(0, 7).coalesce(1), p)
    versioned_write(spark.range(0, 7).where("id < 0").coalesce(2), p)
    with pytest.raises(ValueError, match="positive"):
        compact_snapshot(spark, p, 0)
    # crashed-attempt debris under the next batch dir is reclaimed
    debris = _os.path.join(p, "batch-00000003")
    _os.makedirs(debris)
    open(_os.path.join(debris, "stale.parquet"), "w").write("junk")
    v, plan = compact_snapshot(spark, p, target_rows=100)
    assert v == 3
    got = plan.collect()
    assert len(got) == 1 and got[0].n_rows == 7   # zero-row files gone
    assert sorted(_os.listdir(debris)) == ["bin-00000.parquet"]
    assert {r.id for r in read_version(spark, p, v).collect()} \
        == set(range(7))


def test_compact_snapshot_all_empty_snapshot_refuses(spark, tmp_path):
    from dynamic_partitioner_spark.operators.versioned import (
        compact_snapshot)
    p = str(tmp_path / "t")
    versioned_write(spark.range(5).where("id < 0").coalesce(1), p)
    with pytest.raises(ValueError, match="no non-empty data files"):
        compact_snapshot(spark, p, 10)


def test_compact_snapshot_noop_guard_and_validation(spark, tmp_path):
    """r15 review pins: re-compacting an already-compact table writes
    NO commit (every bin holds one file, nothing to drop — the
    rewrite would double footprint for zero gain); bad
    max_concurrent_bins refuses before any filesystem mutation;
    plan_compaction rejects carry_cols colliding with its outputs."""
    import os as _os

    import pytest as _pytest

    from dynamic_partitioner_spark.operators.partitioned_write import (
        plan_compaction)
    from dynamic_partitioner_spark.operators.versioned import (
        compact_snapshot)
    p = str(tmp_path / "t")
    for n in (40, 30, 20):
        versioned_write(spark.range(n).coalesce(1), p)
    with _pytest.raises(ValueError, match="max_concurrent_bins"):
        compact_snapshot(spark, p, 50, max_concurrent_bins=0)
    assert not _os.path.isdir(_os.path.join(p, "batch-00000004"))
    v, _ = compact_snapshot(spark, p, target_rows=50)
    assert v == 4
    # second run: plan merges nothing -> current version returned,
    # no new commit, no new batch dir
    v2, plan2 = compact_snapshot(spark, p, target_rows=50)
    assert v2 == 4
    assert not _os.path.isdir(_os.path.join(p, "batch-00000005"))
    assert all(r.bin_files == 1 for r in plan2.collect())
    files = spark.createDataFrame(
        [("a", "f1", 10)], "pk string, bin string, n_rows long")
    with _pytest.raises(ValueError, match="carry_cols"):
        plan_compaction(files, ["pk"], "n_rows", 5, carry_cols=["bin"])


def test_read_changes_skips_compaction_commits(spark, tmp_path):
    """r15 review pin: compaction is a pure layout change (row
    multiset identical), so the change feed SKIPS it — Delta CDF's
    dataChange=false treatment of OPTIMIZE — instead of hard-failing
    every incremental consumer after a nightly compaction.  A true
    overwrite still refuses."""
    from dynamic_partitioner_spark.operators.versioned import (
        compact_snapshot, read_changes)
    p = str(tmp_path / "t")
    versioned_write(spark.range(0, 3).coalesce(1), p)       # v1
    versioned_write(spark.range(10, 12).coalesce(1), p)     # v2
    v, _ = compact_snapshot(spark, p, target_rows=100)      # v3 layout
    assert v == 3
    versioned_write(spark.range(20, 21).coalesce(1), p)     # v4
    # feed across the compaction: appends only, nothing from v3
    got = {(r.id, r._commit_version)
           for r in read_changes(spark, p, 0).collect()}
    assert got == {(0, 1), (1, 1), (2, 1), (10, 2), (11, 2), (20, 4)}
    # consumer positioned before the compaction sees only the append
    assert {(r.id, r._commit_version)
            for r in read_changes(spark, p, 2).collect()} == {(20, 4)}
    # a TRUE overwrite still breaks the feed loudly
    versioned_write(spark.range(99, 100).coalesce(1), p,
                    mode="overwrite")                        # v5
    with pytest.raises(ValueError, match="overwrite"):
        read_changes(spark, p, 0)


def test_read_changes_allows_vacuumed_compaction_in_range(
        spark, tmp_path):
    """r15 review pin: the feed never reads a compaction commit's
    dirs, so a VACUUMED compaction in range must not refuse the
    range — the old order ran the vacuum check before the
    dataChange=false filter and falsely refused a fully
    representable answer.  A vacuumed APPEND in range still refuses
    (those rows are genuinely gone)."""
    from dynamic_partitioner_spark.operators.versioned import (
        compact_snapshot, read_changes, vacuum_versions)
    p = str(tmp_path / "t")
    # v1: one append staged as three files so compaction can merge
    versioned_write(spark.range(9).repartition(3), p)
    v2, _ = compact_snapshot(spark, p, target_rows=5)   # 3 -> 2 files
    assert v2 == 2
    v3, _ = compact_snapshot(spark, p, target_rows=100)  # 2 -> 1 file
    assert v3 == 3
    versioned_write(spark.range(20, 22).coalesce(1), p)  # v4 append
    # floor at the last compaction: dirs of v1 and v2 are deleted
    vacuum_versions(spark, p, keep_from=3)
    # consumer checkpointed at v1: everything unread in range is
    # either a compaction (skipped, dirs never read) or a live
    # append — the feed must answer, not refuse
    got = {(r.id, r._commit_version)
           for r in read_changes(spark, p, 1).collect()}
    assert got == {(20, 4), (21, 4)}
    # from the beginning the range covers the VACUUMED APPEND v1 —
    # those rows are gone, so the refusal is real and stays loud
    with pytest.raises(ValueError, match="vacuumed"):
        read_changes(spark, p, 0)


def test_batch_dir_width_grows_past_version_1e8(spark, tmp_path):
    """r15 review pin: ``batch-{version:08d}`` grows to 9 digits at
    version 10^8, and every consumer of the name — the manifest's
    file→dir attribution, pruning, ``is_batch_shaped`` — must keep
    matching it (a width-exact regexp would silently detach all
    stats: n_rows=0, null bounds, read_pruned EMPTY)."""
    import json as _json
    import os as _os

    from dynamic_partitioner_spark.operators.versioned import (
        is_batch_shaped, read_pruned, snapshot_manifest)
    p = str(tmp_path / "t")
    batch = "batch-100000000"
    spark.range(5).coalesce(1).write.parquet(_os.path.join(p, batch))
    _os.makedirs(_os.path.join(p, "_log"))
    with open(_os.path.join(p, "_log", "100000000.json"), "w") as fh:
        _json.dump({"version": 100000000, "mode": "append",
                    "dirs": [batch]}, fh)
    assert is_batch_shaped(batch)
    man = snapshot_manifest(spark, p, stat_cols=("id",)).collect()
    assert len(man) == 1 and man[0].n_rows == 5
    assert (man[0].min_id, man[0].max_id) == (0, 4)
    got = {r.id for r in read_pruned(spark, p, {"id": (1, 3)}).collect()}
    assert got == {1, 2, 3}


# ------------------------------------------------- batched slice staging

def test_write_slices_matches_sequential_writes(spark, tmp_path):
    """versioned_write_slices is semantics-identical to calling
    versioned_write once per slice in plan order: same batch dirs,
    same log modes, same rows per version (r16 staging optimization)."""
    import os

    from dynamic_partitioner_spark.operators.versioned import (
        _commits, versioned_write_slices)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, grp long")
    seq = str(tmp_path / "seq")
    for g, mode in ((0, "append"), (1, "append"), (2, "overwrite")):
        versioned_write(df.where(F.col("grp") == g).drop("grp"), seq,
                        mode=mode)
    bat = str(tmp_path / "bat")
    got = versioned_write_slices(
        df.withColumn("_s", F.col("grp")).drop("grp"), "_s",
        [(0, "append"), (1, "append"), (2, "overwrite")], bat)
    assert got == [1, 2, 3]
    assert [(c["version"], c["mode"], c["dirs"]) for c in _commits(bat)] \
        == [(c["version"], c["mode"], c["dirs"]) for c in _commits(seq)]
    for v in (1, 2, 3):
        assert _ids(read_version(spark, bat, v)) \
            == _ids(read_version(spark, seq, v))
        # schema: the slice column is stripped from the data files
        assert read_version(spark, bat, v).columns == ["id"]
        # one data file per commit
        d = os.path.join(bat, f"batch-{v:08d}")
        assert len([n for n in os.listdir(d)
                    if n.endswith(".parquet")]) == 1


def test_write_slices_appends_after_existing_commits(spark, tmp_path):
    from dynamic_partitioner_spark.operators.versioned import (
        versioned_write_slices)
    from pyspark.sql import functions as F

    p = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(100,)], "id long"), p)
    df = spark.createDataFrame([(1, 0), (2, 1)], "id long, s long")
    assert versioned_write_slices(df, "s", [(0, "append"), (1, "append")],
                                  p) == [2, 3]
    assert _ids(read_version(spark, p)) == {100, 1, 2}


def test_write_slices_carried_duplicate_column(spark, tmp_path):
    """A caller that wants the slice value IN the data duplicates it
    under another name (the documented contract)."""
    from dynamic_partitioner_spark.operators.versioned import (
        versioned_write_slices)
    from pyspark.sql import functions as F

    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 0), (2, 1)], "id long, s long")
    versioned_write_slices(df.withColumn("_sl", F.col("s")), "_sl",
                           [(0, "append"), (1, "append")], p)
    got = read_version(spark, p)
    assert set(got.columns) == {"id", "s"}
    assert {(r.id, r.s) for r in got.collect()} == {(1, 0), (2, 1)}


def test_write_slices_rejects_bad_plans(spark, tmp_path):
    from dynamic_partitioner_spark.operators.versioned import (
        versioned_write_slices)

    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 0)], "id long, s long")
    with pytest.raises(ValueError, match="empty commit plan"):
        versioned_write_slices(df, "s", [], p)
    with pytest.raises(ValueError, match="duplicate slice"):
        versioned_write_slices(df, "s", [(0, "append"), (0, "append")], p)
    with pytest.raises(ValueError, match="unsupported mode"):
        versioned_write_slices(df, "s", [(0, "merge")], p)
    # an empty slice would silently renumber later versions — loud error
    with pytest.raises(ValueError, match="matched no rows"):
        versioned_write_slices(df, "s", [(0, "append"), (7, "append")], p)
    # the failed try must not leave a half-committed table: slice 0 DID
    # stage, but no commit may have landed for the failed plan
    import os
    assert not os.path.isdir(os.path.join(p, "_log")) or not [
        n for n in os.listdir(os.path.join(p, "_log"))
        if n.endswith(".json")]


def test_write_slices_reclaims_stale_stage_dirs(spark, tmp_path):
    """r16 review: a crash after a partial commit prefix advances the
    next version, so the crashed attempt's _stage-{old} dir must be
    reclaimed on ANY later write — not just an exact-version retry."""
    import os

    from dynamic_partitioner_spark.operators.versioned import (
        versioned_write_slices)

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, _s long")
    versioned_write_slices(df, "_s", [(10, "append")], path)
    # simulate a crashed attempt's leftover stage dir
    stale = os.path.join(path, "_stage-00000001")
    os.makedirs(os.path.join(stale, "_s=10"))
    versioned_write_slices(df, "_s", [(20, "append")], path)
    assert not os.path.exists(stale)
    assert not [n for n in os.listdir(path) if n.startswith("_stage-")]


def test_write_slices_stage_sweep_spares_higher_versions(spark,
                                                         tmp_path):
    """r16 ADVICE: the stale-stage sweep is version-scoped — a stage
    dir at a HIGHER version than this writer's next commit could only
    belong to a concurrent writer and must never be destroyed
    mid-commit; crashed-attempt dirs at <= next version (and
    unparsable debris) are reclaimed as before."""
    import os

    from dynamic_partitioner_spark.operators.versioned import (
        versioned_write_slices)

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, _s long")
    versioned_write_slices(df, "_s", [(10, "append")], path)
    future = os.path.join(path, "_stage-00000099")   # concurrent writer
    os.makedirs(os.path.join(future, "_s=10"))
    junk = os.path.join(path, "_stage-garbage")      # unknown vintage
    os.makedirs(junk)
    versioned_write_slices(df, "_s", [(20, "append")], path)
    assert os.path.exists(future), "higher-version stage was destroyed"
    assert not os.path.exists(junk)
