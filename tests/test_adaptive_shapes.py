"""Scale-adaptive plan shapes (r14, guide §2.3/§3.1, verdict r13 #2/#4).

Two query paths pick their plan from the planner's own broadcast-fit
estimate: while the dimension side broadcasts (every bench/oracle SF)
they keep the r13 shape bit-for-bit, and past the threshold they switch
to the shape that wins once the fact side must shuffle (pre-aggregation
below the join; GraphX-style vertex routing). These tests force the
big-data branch by disabling auto-broadcast and pin BOTH branches to
identical results — the hash-stability proof the driver's oracle cannot
give for a branch it never executes locally.
"""

from __future__ import annotations

import pytest

from datamodel_clinicaldata_spark.operators.partitioning import (
    estimated_size_bytes,
    fits_auto_broadcast,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def no_auto_broadcast(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def test_fits_auto_broadcast_gate(spark, sf_dir):
    from datamodel_clinicaldata_spark.sources.readers import read_table

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    assert (estimated_size_bytes(o) or 0) > 0
    assert fits_auto_broadcast(o)  # sf0.001 orders ≪ 10 MB
    big = spark.range(1_000_000_000)  # exact 8 B/row estimate → 8 GB
    assert not fits_auto_broadcast(big)
    # disabled broadcasting (threshold ≤ 0) must read as "does not fit"
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        assert not fits_auto_broadcast(o)
    finally:
        spark.conf.set(key, old)


def test_revenue_by_nation_preagg_branch_matches_flat(spark, sf_dir):
    """The pre-aggregated branch must reproduce the flat branch's rounded
    revenue EXACTLY (same 4-dp values ⇒ same driver hash): the regrouped
    float sum may not move any group's 4th decimal."""
    from datamodel_clinicaldata_spark.queries_relational import (
        agg_revenue_by_nation,
    )

    flat = _rows(agg_revenue_by_nation(spark, sf_dir))
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        df = agg_revenue_by_nation(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # the partial aggregate sits BELOW the join: an aggregate keyed
        # on l_orderkey exists, which the flat branch never has
        assert "Keys [1]: [l_orderkey" in plan
        # fact joins degrade to sort-merge (the explicitly hinted nation
        # broadcast legitimately survives the disabled threshold)
        assert "SortMergeJoin" in plan
        preagg = _rows(df)
    finally:
        spark.conf.set(key, old)
    assert preagg == flat


def test_custdist_preagg_branch_matches_flat(spark, sf_dir):
    """q13: coalesce(pre-count, 0) over the pre-aggregated branch must
    reproduce the flat left-join count exactly (integer counts — no
    rounding slack to hide behind)."""
    from datamodel_clinicaldata_spark.queries_tpch import agg_custdist

    flat = _rows(agg_custdist(spark, sf_dir))
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        df = agg_custdist(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # the count aggregate sits BELOW the join, keyed on o_custkey
        assert "Keys [1]: [o_custkey" in plan
        preagg = _rows(df)
    finally:
        spark.conf.set(key, old)
    assert preagg == flat


def test_returned_customers_preagg_branch_matches_flat(spark, sf_dir):
    """q10: the per-orderkey pre-aggregated revenue regrouped by custkey
    may not move any customer's 4th decimal (driver hashes the rounded
    value)."""
    from datamodel_clinicaldata_spark.queries_relational import (
        topk_returned_customers,
    )

    flat = _rows(topk_returned_customers(spark, sf_dir))
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        df = topk_returned_customers(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Keys [1]: [l_orderkey" in plan
        preagg = _rows(df)
    finally:
        spark.conf.set(key, old)
    assert preagg == flat


def test_label_propagation_routed_matches_broadcast(spark, sf_dir):
    """The vertex-routed rounds (labels too big to broadcast) must land
    on the identical confusion rollup as the broadcast rounds."""
    from datamodel_clinicaldata_spark.queries_relational import (
        graph_label_propagation,
    )

    bc = _rows(graph_label_propagation(spark, sf_dir))
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        df = graph_label_propagation(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastHashJoin" not in plan  # no per-round broadcast
        routed = _rows(df)
    finally:
        spark.conf.set(key, old)
    assert routed == bc
