"""Join-strategy plan assertions (tools/audit_plans.py --check).

The audit tool has always RECORDED exchanges/joins; these tests pin
that it now ASSERTS them: data joins must be BHJ/SMJ, CartesianProduct
is never allowed, and a BroadcastNestedLoopJoin is tolerated only for
the documented scalar-stats / exact-baseline keys — so a join that
silently degrades to a nested loop fails the audit instead of
shipping.
"""

from __future__ import annotations

import importlib.util
import sys


def _audit():
    spec = importlib.util.spec_from_file_location(
        "audit_mod", "/root/repo/tools/audit_plans.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["audit_mod"] = m
    spec.loader.exec_module(m)
    return m


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_mod_plan", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["entry_mod_plan"] = m
    spec.loader.exec_module(m)
    return m


SF = "/root/testdata/sf0.001"


def test_representative_plans_pass_check(spark):
    """A no-BNLJ key, a scalar-stats-BNLJ key, and an exact-baseline
    key all pass their live-plan assertions."""
    A, E = _audit(), _entry()
    qs = E.queries()
    for key in ("query_sql_tpch_q6", "text_tfidf", "similarity_topk",
                "query_join_broadcast"):
        plan = A.formatted_plan(qs[key](spark, SF))
        assert A.check_plan(key, plan) == [], key


def test_forced_bnlj_mutation_is_caught(spark):
    """A data×data non-equi join (the exact mutation the check exists
    for) must be flagged for any non-allowlisted key."""
    A = _audit()
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id",
                                                           "value")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity")
    bad = ev.join(li, ev.value > li.l_quantity)     # non-equi → BNLJ
    plan = A.formatted_plan(bad)
    assert "BroadcastNestedLoopJoin" in plan        # mutation took
    problems = A.check_plan("query_sql_tpch_q6", plan)
    assert problems and "nested loop" in problems[0]


def test_bnlj_over_allowance_and_missing_scalar_agg_flagged(spark):
    """Even an allowlisted key fails when the BNLJ count exceeds its
    recorded allowance, and a scalar-stats key whose plan lost its
    ungrouped aggregate is flagged."""
    A = _audit()
    fake_plan = "\n".join(
        f"({i}) BroadcastNestedLoopJoin BuildRight" for i in (1, 2))
    problems = A.check_plan("text_tfidf", fake_plan)
    assert any("allowed 1" in p for p in problems)
    one = "(1) BroadcastNestedLoopJoin BuildRight\nKeys: [k]"
    problems = A.check_plan("text_tfidf", one)
    assert any("scalar" in p for p in problems)
    # CartesianProduct is never allowed, even for allowlisted keys
    cart = "(1) CartesianProduct"
    assert any("CartesianProduct" in p
               for p in A.check_plan("similarity_topk", cart))
