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
