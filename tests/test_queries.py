"""Query-layer keys with behavior not covered by the SQL oracle."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_approx_distinct_error_bound(spark):
    """HLL estimate within 5% of exact per group (rsd=0.02 requested)."""
    rows = E.q_approx_distinct(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert abs(r.approx_users - r.exact_users) / r.exact_users < 0.05


def test_pivot_matches_unpivoted_sums(spark):
    from pyspark.sql import functions as F
    piv = {r.l_returnflag: (r.qty_f, r.qty_o)
           for r in E.q_pivot(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    flat = {(r.l_returnflag, r.l_linestatus): r.s
            for r in li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("s")).collect()}
    for rf, (f_qty, o_qty) in piv.items():
        assert f_qty == flat.get((rf, "F"))
        assert o_qty == flat.get((rf, "O"))


def test_approx_percentiles_rank_error_bound(spark):
    """percentile_approx's guarantee is RANK-space: the returned value's
    true rank must lie within ~accuracy⁻¹ of the requested quantile
    (value-space gaps can be large in sparse tails, so that is the
    wrong thing to pin)."""
    import sys
    sys.path.insert(0, "/root/repo")

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    approx = {r.event_type: (r.p50_approx, r.p95_approx, r.p99_approx)
              for r in E.q_approx_percentiles(spark, sf).collect()}
    events = spark.read.parquet(f"{sf}/events.parquet")
    by_type = {}
    for r in events.select("event_type", "value").collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    assert approx.keys() == by_type.keys()
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for q, a in zip((0.5, 0.95, 0.99), approx[et]):
            # rank of the approx value (rounding to 2dp shifts the
            # value by <0.005 — count with that slack)
            rank = sum(1 for v in vals if v <= a + 0.005) / n
            assert abs(rank - q) <= 0.02 + 1.0 / n, (et, q, a, rank)


def test_read_fixed_width_offsets_types_and_padding(spark, tmp_out):
    from dynamic_partitioner_spark.sources.read import read_fixed_width

    lines = ["1    alpha     42   ",
             "230  beta      7    "]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    df.coalesce(1).write.text(tmp_out)
    got = {(r.id, r.name, r.n) for r in read_fixed_width(
        spark, tmp_out,
        [("id", 1, 5, "long"), ("name", 6, 10, "string"),
         ("n", 16, 5, "long")]).collect()}
    assert got == {(1, "alpha", 42), (230, "beta", 7)}


def test_hll_mergeable_sketches_union_equals_direct(spark):
    """Merging stored per-day HLL sketches gives the SAME estimate as
    sketching the whole stream directly (mergeable-summary property),
    and estimates stay within HLL error of exact."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "entry_mod_hll", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["entry_mod_hll"] = m
    spec.loader.exec_module(m)

    from pyspark.sql import functions as F

    rows = m.q_hll_mergeable(spark, "/root/testdata/sf0.01").collect()
    daily = [r for r in rows if r.day_idx >= 0]
    total = [r for r in rows if r.day_idx == -1]
    assert len(total) == 1 and daily
    for r in daily:                       # HLL default rel err ~1.6%
        assert abs(r.est_users - r.exact_users) <= 0.05 * r.exact_users
    t = total[0]
    assert abs(t.est_users - t.exact_users) <= 0.05 * t.exact_users

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    direct = events.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
        .cast("long").alias("e")).collect()[0].e
    assert t.est_users == direct          # union of parts == whole
