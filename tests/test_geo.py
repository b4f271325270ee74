"""Grid-bucketed spatial join — brute-force parity, boundary and
negative-coordinate cases, int32 inputs."""

from __future__ import annotations

import pytest

from dynamic_partitioner_spark.operators.geo import grid_distance_join


def _pairs(spark, lpts, rpts, r, itype="long"):
    left = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(lpts)],
        f"lid long, lat_u {itype}, lon_u {itype}")
    right = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(rpts)],
        f"rid long, lat_u {itype}, lon_u {itype}")
    return {(p.lid, p.rid, p.dist2) for p in
            grid_distance_join(left, right, "lid", "rid",
                               radius_u=r).collect()}


def test_matches_bruteforce_including_exact_boundary(spark):
    lpts = [(0, 0), (100, 100), (-50, 60), (1000, -1000)]
    rpts = [(0, 100), (-40, 55), (30, 40), (900, -950), (5000, 5000)]
    r = 100
    got = _pairs(spark, lpts, rpts, r)
    want = set()
    for i, (la, lo) in enumerate(lpts):
        for j, (ra, ro) in enumerate(rpts):
            d2 = (la - ra) ** 2 + (lo - ro) ** 2
            if d2 <= r * r:                # boundary INCLUSIVE
                want.add((i, j, d2))
    assert got == want and len(got) > 0
    # pin one exactly-at-radius pair: (0,0) to (0,100), dist2 = r^2
    assert (0, 0, 10000) in got


def test_negative_coordinates_straddling_cell_zero(spark):
    # points on either side of 0 within radius despite Spark's
    # truncate-toward-zero div putting them in the same wide cell 0
    got = _pairs(spark, [(-40, -40)], [(40, 40)], 120)
    assert got == {(0, 0, 12800)}
    # and a pair crossing a true cell boundary in negative space
    got = _pairs(spark, [(-130, 0)], [(-250, 0)], 121)
    assert got == {(0, 0, 14400)}


def test_int32_inputs_do_not_overflow(spark):
    # candidate in the 3x3 neighborhood at large magnitude: dist2 would
    # exceed int32 without the long cast
    got = _pairs(spark, [(2_000_000_000, 0)], [(2_000_000_000 - 60000, 0)],
                 50000, itype="int")
    assert got == set()                   # outside radius, but must not raise
    got = _pairs(spark, [(2_000_000_000, 0)], [(2_000_000_000 - 40000, 0)],
                 50000, itype="int")
    assert got == {(0, 0, 1_600_000_000)}


def test_rejects_nonpositive_radius(spark):
    with pytest.raises(ValueError):
        _pairs(spark, [(0, 0)], [(0, 0)], 0)


def test_null_coordinates_are_dropped_before_bucketing(spark):
    """r15 review pin: concat_ws skips NULL components, so NULL-coord
    rows collapsed into degenerate shared cells ('' or a bare
    number) and met EVERY such row on the other side — unbounded
    candidates on dirty data.  They can never satisfy the distance
    predicate, so they are filtered before bucketing; results equal
    the clean-data join."""
    left = spark.createDataFrame(
        [(0, 10, 10), (1, None, 10), (2, None, None), (3, 7000, None)],
        "lid long, lat_u long, lon_u long")
    right = spark.createDataFrame(
        [(0, 12, 11), (1, None, None), (2, None, 10), (3, 7000, None)],
        "rid long, lat_u long, lon_u long")
    got = {(p.lid, p.rid) for p in
           grid_distance_join(left, right, "lid", "rid",
                              radius_u=100).collect()}
    assert got == {(0, 0)}


def test_self_join_with_identical_id_name_refuses_loudly(spark):
    """r15 review pin: left_id == right_id would emit two columns
    with one name (AMBIGUOUS_REFERENCE downstream at best) — refuse
    up front with the aliasing fix in the message."""
    df = spark.createDataFrame([(1, 5, 5)], "id long, lat_u long, lon_u long")
    with pytest.raises(ValueError, match="alias"):
        grid_distance_join(df, df, "id", "id")
