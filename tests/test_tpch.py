"""TPC-H completion pack: value invariants + plan-shape pins.

The value-level correctness gate is the DuckDB oracle (tools/
oracle_check.py); these tests pin the *scale-relevant* plan properties
that a hash comparison cannot see, plus cheap cross-query invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datamodel_clinicaldata_spark.queries_tpch import (
    agg_brand_band_revenue,
    agg_custdist,
    agg_idle_customers,
    topk_supplier_revenue,
)
from datamodel_clinicaldata_spark.sources.readers import read_table


from datamodel_clinicaldata_spark.plans.audit import physical_plan as _formatted_plan


def test_custdist_accounts_for_every_customer(spark, sf_dir):
    """q13's histogram must partition the customer set: Σ custdist =
    |customer| (zero-order customers included via the left join)."""
    dist = agg_custdist(spark, sf_dir).agg(F.sum("custdist")).collect()[0][0]
    n_cust = read_table(spark, sf_dir, "customer").count()
    assert dist == n_cust


def test_top_supplier_revenue_is_global_max(spark, sf_dir):
    """Every returned supplier carries the same (maximal) revenue."""
    rows = topk_supplier_revenue(spark, sf_dir).collect()
    assert rows, "quarter window selects no lineitem rows"
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1


def test_brand_band_part_filter_reaches_scan(spark, sf_dir):
    """q19's separable dim residue (brand IN … ∧ size ≤ 30) must be pushed
    into the part parquet scan, not evaluated post-join — at 100 TB this
    prunes the build side before any shuffle."""
    plan = _formatted_plan(agg_brand_band_revenue(spark, sf_dir))
    scan_blocks = [b for b in plan.split("\n\n") if "part.parquet" in b]
    assert scan_blocks, plan
    assert any("PushedFilters" in b and "p_brand" in b and "p_size" in b for b in scan_blocks), (
        "part dim filter not pushed to scan:\n" + plan
    )


def test_idle_customers_uses_anti_join(spark, sf_dir):
    """q22's NOT EXISTS must plan as a hash anti join (broadcast or
    shuffled) — never a cartesian/nested-loop shape."""
    plan = _formatted_plan(agg_idle_customers(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("qname", ["agg_late_suppliers", "agg_small_quantity_revenue"])
def test_decorrelated_aggregates_single_lineitem_pass_each(spark, sf_dir, qname):
    """The de-correlated per-group subqueries re-scan lineitem once (two
    scans total: stats pass + probe pass) — not once per outer row."""
    from datamodel_clinicaldata_spark.registry import QUERIES

    plan = _formatted_plan(QUERIES[qname](spark, sf_dir))
    assert plan.count("lineitem.parquet") <= 2, plan


def test_ensure_min_parallelism_noop_when_wide(spark, sf_dir):
    """Already-parallel inputs pass through untouched (no extra exchange);
    single-partition inputs spread to the session parallelism."""
    from datamodel_clinicaldata_spark.operators.partitioning import (
        ensure_min_parallelism,
    )

    target = spark.sparkContext.defaultParallelism
    narrow = read_table(spark, sf_dir, "embeddings")
    assert narrow.rdd.getNumPartitions() < target  # single-file testdata
    widened = ensure_min_parallelism(narrow)
    assert widened.rdd.getNumPartitions() == target
    already = widened
    assert ensure_min_parallelism(already) is already


def test_ensure_min_parallelism_keyed_colocates_groups(spark, sf_dir):
    """The keyed spread hash-partitions on the key, so every row of a
    group lands in ONE partition (the downstream groupBy reuses the
    exchange) and the exploded descendant needs no further shuffle for
    a key-grouped aggregate. Values are unchanged vs the bare scan."""
    from pyspark.sql import functions as F

    from datamodel_clinicaldata_spark.operators.partitioning import (
        ensure_min_parallelism,
    )

    target = spark.sparkContext.defaultParallelism
    d = ensure_min_parallelism(
        read_table(spark, sf_dir, "documents"), "doc_id"
    )
    assert d.rdd.getNumPartitions() == target
    # each doc_id maps to exactly one partition id
    spread = (
        d.select("doc_id", F.spark_partition_id().alias("pid"))
        .groupBy("doc_id")
        .agg(F.count_distinct("pid").alias("n_pids"))
        .agg(F.max("n_pids").alias("mx"))
        .collect()[0]["mx"]
    )
    assert spread == 1
    # a keyed aggregate after explode adds no exchange beyond the spread
    from datamodel_clinicaldata_spark.plans.audit import audit

    exploded = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert audit(exploded).exchanges == 1
    # values identical to the unspread plan
    base = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, exploded.collect())) == sorted(
        map(tuple, base.collect())
    )


def test_retention_matrix_offset_zero_totality(spark, sf_dir):
    """Every cohort's offset-0 cell counts exactly its cohort members
    (each user is active in their own first week by construction), and
    offsets are non-negative."""
    from datamodel_clinicaldata_spark.queries_relational import (
        retention_cohort_matrix,
    )

    rows = retention_cohort_matrix(spark, sf_dir).collect()
    assert all(r.week_offset >= 0 for r in rows)
    zero = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    n_users = (
        read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(zero.values()) == n_users


def test_supplier_part_counts_denylist_is_anti_join(spark, sf_dir):
    """q16's NOT IN denylist must plan as a (broadcast) anti join."""
    from datamodel_clinicaldata_spark.queries_tpch import agg_supplier_part_counts

    plan = _formatted_plan(agg_supplier_part_counts(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan


def test_important_stock_threshold_is_broadcast(spark, sf_dir):
    """q11's global-threshold scalar joins in as a broadcast single row —
    never a shuffle keyed on nothing."""
    from datamodel_clinicaldata_spark.queries_tpch import agg_important_stock

    plan = _formatted_plan(agg_important_stock(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") <= 2, plan


def test_min_cost_supplier_window_is_part_partitioned(spark, sf_dir):
    """q2's de-correlated min runs partitioned by part — no global sort."""
    from datamodel_clinicaldata_spark.plans.audit import audit
    from datamodel_clinicaldata_spark.queries_tpch import agg_min_cost_supplier

    a = audit(agg_min_cost_supplier(spark, sf_dir))
    assert a.windows == 1
    assert a.unpartitioned_windows == 0


def test_window_funnel_semantics(spark, tmp_path):
    """Windowed funnel: the span constraint applies to the WHOLE chain,
    and keeping the latest viable chain start is what lets a later
    tight chain count when an earlier loose one cannot."""
    import datetime as dt

    from datamodel_clinicaldata_spark.queries_relational import (
        events_window_funnel,
    )

    T0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, minutes, etype):
        return (eid, uid, T0 + dt.timedelta(minutes=minutes), etype, 1.0)

    W_MIN = 720  # operator window = 12 h
    rows = [
        # user 1: full chain inside the window → depth 3
        ev(1, 1, 0, "view"), ev(2, 1, 10, "click"), ev(3, 1, 20, "purchase"),
        # user 2: view→click ok, purchase past the window FROM THE VIEW
        # (span constraint is chain-wide, not per-step) → depth 2
        ev(4, 2, 0, "view"), ev(5, 2, W_MIN - 5, "click"),
        ev(6, 2, W_MIN + 5, "purchase"),
        # user 3: early lone view, then a LATER tight chain — the greedy
        # must restart from the later view → depth 3
        ev(7, 3, 0, "view"), ev(8, 3, 2 * W_MIN, "view"),
        ev(9, 3, 2 * W_MIN + 10, "click"), ev(10, 3, 2 * W_MIN + 20, "purchase"),
        # user 4: purchase BEFORE any view/click chain → depth 1 (view only)
        ev(11, 4, 0, "purchase"), ev(12, 4, 10, "view"),
        # user 5: click with no prior view → depth 0
        ev(13, 5, 0, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["user_id"]: r["funnel_depth"]
        for r in events_window_funnel(spark, str(tmp_path)).collect()
    }
    assert out == {1: 3, 2: 2, 3: 3, 4: 1, 5: 0}
