"""Declarative data-quality expectations."""

from __future__ import annotations

import pytest

from dynamic_partitioner_spark.operators.expectations import (
    check_expectations)


def test_all_rule_kinds_count_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 100), (2, -5.0, 100), (2, 50.0, None),
         (3, 999.0, 200), (None, 20.0, 300)],
        "id long, amount double, ref long")
    ref = spark.createDataFrame([(100,), (200,)], "k long")
    out = {(r.rule_id, r.rule, r.col_name): r.n_violations
           for r in check_expectations(df, [
               ("not_null", "id"),
               ("range", "amount", 0.0, 100.0),
               ("unique", "id"),
               ("fk", "ref", ref, "k"),
           ]).collect()}
    assert out == {
        (1, "not_null", "id"): 1,
        (2, "range", "amount"): 2,      # -5 and 999
        (3, "unique", "id"): 1,         # one extra row with id=2
        (4, "fk", "ref"): 1,            # ref=300 orphaned; NULL ignored
    }


def test_clean_data_reports_zero_everywhere(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id long, v double")
    out = check_expectations(df, [("not_null", "id"), ("unique", "id"),
                                  ("range", "v", 0.0, 10.0)]).collect()
    assert all(r.n_violations == 0 for r in out) and len(out) == 3


def test_unknown_rule_and_empty_rules_raise(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        check_expectations(df, [])
    with pytest.raises(ValueError):
        check_expectations(df, [("regexp", "id")])


def test_fk_without_forced_broadcast_matches(spark):
    """r15 review pin: the fk anti-join's broadcast hint is an option
    (default on), not a hard-wired hint — a huge reference would OOM
    the driver under a forced broadcast; counts are identical either
    way."""
    df = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    ref = spark.createDataFrame([(1,), (2,)], "rk long")
    rules = [("fk", "k", ref, "rk")]
    a = check_expectations(df, rules).collect()
    b = check_expectations(df, rules, broadcast_refs=False).collect()
    assert [r.n_violations for r in a] == [1]
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
