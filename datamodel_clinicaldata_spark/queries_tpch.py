"""TPC-H completion pack — the analytical shapes from the TPC-H suite not
already covered by ``queries_relational`` (q1/q3/q4/q5/q6/q7/q8/q10/q14/q18
shapes live there), adapted to the driver testdata star schema.

The testdata has no ``partsupp`` table and ``lineitem`` lacks
``l_shipmode/l_commitdate/l_receiptdate``, so q2/q11/q16/q20 are out of
reach and q9/q12/q17/q19/q21 are *shape-preserving adaptations*: the join
tree, subquery structure, and aggregation pattern of the original are kept
(that is what exercises the planner), with predicates rewritten onto the
columns that exist. Each docstring names its TPC-H ancestor.

Scale notes (100 TB):
- Every per-group "average" subquery (q17's avg-quantity-per-part, q22's
  positive-balance average) is computed as an aggregate and joined back —
  broadcast when provably dim-sized, planner-chosen otherwise. No
  correlated per-row re-evaluation.
- The anti-join shapes (q22's NOT EXISTS) use Spark's ``left_anti``,
  which stays a shuffle-or-broadcast hash join — never a cross product.
- Single-row global results (q17/q19) end in a partial-then-final
  aggregate; no data ever funnels through one task before the final
  2-byte combine.

Float policy (module-wide, matches queries_relational): every SUM over
doubles is ROUNDed to 4 decimals on both engines; counts cast to BIGINT;
quotients of rounded sums are never hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datamodel_clinicaldata_spark.registry import register
from datamodel_clinicaldata_spark.sources.readers import read_table

def _disc_price():
    # Built lazily: classic-mode Column construction needs an active
    # SparkContext, and this module is imported (registry side effects)
    # before any session exists in bench/driver entrypoints.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "agg_product_type_profit",
    """
    SELECT n_name AS supp_nation,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity), 4) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def agg_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape (product-type profit by nation/year). The original
    prices cost from ``partsupp.ps_supplycost``; with no partsupp table the
    cost model is ``0.5 * p_retailprice`` — the five-table join tree and
    LIKE-filtered part dim are unchanged. The part filter prunes ~2000 →
    LIKE-matched rows at the scan; nation broadcasts."""
    li = read_table(spark, sf_dir, "lineitem")
    p = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    su = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = F.broadcast(read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    profit = _disc_price() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.round(F.sum(profit), 4).alias("profit"))
    )


@register(
    "agg_shipmode_priority",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def agg_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape (priority-class counts per ship class). The
    original groups by ``l_shipmode`` and filters on commit/receipt dates,
    none of which exist here; grouping key becomes ``l_returnflag`` and
    the date window filters ``l_shipdate`` — the fact⋈fact join with
    conditional two-way counting is intact. The shipdate filter reaches
    the lineitem scan before the join.

    r14 MEASURED DEAD END (guide §2.3, verdict r13 #2): pre-aggregating
    by (l_orderkey, l_returnflag) below the join cuts only 1.10:1 in
    rows at the testdata distribution (87,698 → 79,670 at sf0.1 —
    measured via DuckDB) while its exchange cannot ride the join's
    orderkey clustering (plan grew 6 → 8 Exchange when forced). 10%
    fewer rows do not pay for two extra aggregated-row exchanges at any
    scale; the flat shape stands."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "agg_custdist",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def agg_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 (customer order-count distribution) — left join so
    zero-order customers survive with count 0, then a histogram of the
    counts. The original's ``o_comment NOT LIKE`` filter becomes an
    orderpriority exclusion (same join-condition-not-WHERE placement,
    which is the semantic point of q13). Two inherent shuffles: per-key
    count, then distribution; the second operates on ≤|customers| rows.

    r14 (guide §2.3 "aggregate before you shuffle", verdict r13 #2):
    while either side broadcasts (every bench/oracle SF) the flat r13
    shape is kept bit-for-bit. Past broadcast scale the flat plan
    shuffles RAW orders rows by o_custkey for a sort-merge join; the
    pre-aggregated branch counts orders per custkey BELOW the join —
    the partial (map-side) count shrinks the orders exchange ~10:1 in
    rows (orders-per-customer) and the join then carries one row per
    customer. ``count(o_orderkey)`` over the left join ≡
    ``coalesce(pre-count, 0)`` exactly (integer count, o_orderkey
    non-null on every matched row, c_custkey unique); branch equality
    pinned in tests/test_adaptive_shapes.py."""
    from datamodel_clinicaldata_spark.operators.partitioning import (
        fits_auto_broadcast,
    )

    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    if fits_auto_broadcast(c) or fits_auto_broadcast(o):
        per_cust = (
            c.join(
                o,
                (F.col("c_custkey") == F.col("o_custkey"))
                & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
                "left",
            )
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").cast("long").alias("c_count"))
        )
    else:
        cnt = (
            o.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        per_cust = c.join(
            cnt, F.col("c_custkey") == F.col("o_custkey"), "left"
        ).select(
            "c_custkey",
            F.coalesce(F.col("__c"), F.lit(0)).cast("long").alias("c_count"),
        )
    return per_cust.groupBy("c_count").agg(F.count("*").cast("long").alias("custdist"))


@register(
    "topk_supplier_revenue",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def topk_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 (top supplier): quarterly revenue per supplier, keep the
    max-revenue supplier(s). The scalar ``max`` subquery is a 1-row
    aggregate over the *aggregated* frame (|suppliers| rows, not
    |lineitem|) cross-joined back by broadcast — rounding before the max
    so the equality predicate compares identical doubles on both
    engines. (Round 8: this replaced an unpartitioned global-max window,
    which funneled the supplier rollup through a SinglePartition
    exchange; the map-side-combined aggregate + broadcast costs no
    single-task pass at any dimension size.) Supplier dim joins the
    one-row-per-supplier revenue frame broadcast-side."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_disc_price()), 4).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(
        F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no")
    ).select("s_suppkey", "s_name", "total_revenue")


@register(
    "agg_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS a_partkey,
               0.5 * avg(l_quantity) AS qty_threshold
        FROM lineitem GROUP BY 1
    ) ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size < 15
      AND l_quantity < qty_threshold
    """,
)
def agg_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 (small-quantity-order revenue). The correlated
    ``0.2*avg(l_quantity)`` per-part subquery is de-correlated into a
    grouped aggregate joined back on partkey (|parts| rows — broadcast);
    the part filter swaps the absent ``p_container`` for brand+size. The
    division by 7 happens once on the final single row, after rounding —
    a quotient of an unrounded sum would hash-diverge."""
    li = read_table(spark, sf_dir, "lineitem")
    p = (
        read_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_threshold")
    )
    joined = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(thresholds), F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return joined.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly")
    )


@register(
    "agg_brand_band_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def agg_brand_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 (discounted revenue, OR-of-ANDs) — the classic
    pushdown-hostile disjunction mixing fact (quantity) and dim (brand,
    size) predicates. The dim-only residue of the disjunction
    (brand ∈ {1,2,3} ∧ size ≤ 30) IS separable, so it is applied to the
    part scan explicitly — at 100 TB that prunes the build side before
    the join while the mixed OR evaluates post-join, mirroring what the
    original query demands of an optimizer."""
    li = read_table(spark, sf_dir, "lineitem")
    p = (
        read_table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & (F.col("p_size").between(1, 30))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20) & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30) & qty.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(_disc_price()), 4).alias("revenue"))
    )


@register(
    "agg_late_suppliers",
    """
    WITH order_stats AS (
        SELECT l_orderkey AS ok,
               max(l_shipdate) AS max_ship,
               count(DISTINCT l_suppkey) AS n_supp
        FROM lineitem GROUP BY 1
    )
    SELECT s_name, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS numwait
    FROM lineitem
    JOIN order_stats ON ok = l_orderkey
    JOIN orders      ON o_orderkey = l_orderkey
    JOIN supplier    ON s_suppkey = l_suppkey
    JOIN nation      ON n_nationkey = s_nationkey
    WHERE o_orderstatus = 'F'
      AND n_supp > 1
      AND l_shipdate = max_ship
      AND n_name = 'NATION_1'
    GROUP BY 1
    """,
)
def agg_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape (suppliers who kept orders waiting). The original's
    EXISTS/NOT-EXISTS pair over commit/receipt dates is re-expressed on
    available columns: a supplier "kept the order waiting" when its line
    is the *latest* shipment of a completed multi-supplier order. The
    per-order stats (max shipdate, distinct-supplier count) are one
    grouped pass over lineitem joined back on orderkey — the same
    de-correlation the reference plans for q21's correlated EXISTS.
    countDistinct of orders per supplier matches the original's
    one-wait-per-order semantics when ties ship simultaneously."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    # r13 (guide §2.4): the per-order stats were a groupBy + join back
    # onto lineitem — two wide passes over the fact (aggregate exchange +
    # self-join exchange, plan: 5 scans). A window over l_orderkey
    # computes the same (max ship, distinct-supplier count) in the ONE
    # exchange the filter needs; size(collect_set(..)) == countDistinct
    # per group and the per-order buffer is bounded by lines-per-order
    # (≤7 on TPC-H data). Alternating A/B at sf0.1: 2.04 → 1.28 s,
    # results verified identical row-for-row.
    w = Window.partitionBy("l_orderkey")
    li_stats = (
        li.withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
    )
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    su = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = F.broadcast(
        read_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_1")
        .select("n_nationkey")
    )
    return (
        li_stats
        .filter((F.col("n_supp") > 1) & (F.col("l_shipdate") == F.col("max_ship")))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("numwait"))
    )


@register(
    "agg_idle_customers",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def agg_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 (global sales opportunity): above-average-balance
    customers with no *recent* orders (every testdata customer has some
    order, so the original's no-orders-ever predicate would select zero
    rows — the recency cutoff keeps the anti-join shape non-trivial). The
    scalar average is a one-row aggregate cross-joined in (broadcast by
    construction); NOT EXISTS is a ``left_anti`` hash join against the
    distinct recent-order custkeys — the
    anti side shrinks to |customers| before shuffling. Market segment
    stands in for the absent phone-prefix grouping."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    o_keys = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the testdata ships no partsupp table, so the four
# partsupp-dependent TPC-H shapes (q2/q11/q16/q20) run against one derived
# from lineitem — supply cost := min observed unit price, availability :=
# total shipped quantity — built by the IDENTICAL grouped aggregate in both
# engines. The unit price is one IEEE double division (bit-identical across
# engines) and min over identical doubles is order-independent, so the
# 4-dp supply cost is fixed-pointed at the source as
# ``ps_cost_e4 = floor(min(unit) * 1e4 + 0.5)`` (BIGINT). ``round(x, 4)``
# is NOT engine-independent (Spark rounds through BigDecimal's shortest
# decimal string, DuckDB rounds the raw binary double), but floor of a
# bit-identical double is — the same doctrine as the gapfill grid
# (operators/timeseries.py). ps_supplycost (double, for display/equality)
# is the single exact division ps_cost_e4 / 1e4; downstream value sums
# (q11) stay in the integer e4 domain so they are exact and
# accumulation-order-free.
# ---------------------------------------------------------------------------
_PS_SQL = """ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(floor(min(l_extendedprice / l_quantity) * 10000.0 + 0.5)
                  AS BIGINT) AS ps_cost_e4,
             floor(min(l_extendedprice / l_quantity) * 10000.0 + 0.5) / 10000.0
               AS ps_supplycost,
             sum(l_quantity) AS ps_qty
      FROM lineitem GROUP BY 1, 2
    )"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    cost_e4 = F.floor(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 10000.0 + 0.5
    )
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        cost_e4.cast("long").alias("ps_cost_e4"),
        (cost_e4 / 10000.0).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_qty"),
    )


@register(
    "agg_min_cost_supplier",
    f"""
    WITH {_PS_SQL}, costs AS (
      SELECT p_partkey, s_suppkey, s_name, n_name, ps_supplycost,
             min(ps_supplycost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM ps
      JOIN part ON p_partkey = ps_partkey AND p_size < 10 AND p_type = 'LARGE'
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
    )
    SELECT p_partkey, s_suppkey, s_name, n_name,
           ps_supplycost AS supplycost
    FROM costs WHERE ps_supplycost = min_cost
    """,
)
def agg_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape (minimum-cost supplier): the correlated min-cost
    subquery de-correlates into a per-part window min over the already
    dim-filtered (part × supplier × region) frame — |filtered ps| rows,
    not |lineitem|. Equality compares source-rounded doubles, so the
    window-min form is hash-identical to the subquery form."""
    from pyspark.sql import Window

    ps = _derived_partsupp(spark, sf_dir)
    p = (
        read_table(spark, sf_dir, "part")
        .filter((F.col("p_size") < 10) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    su = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    nr = F.broadcast(n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select("n_nationkey", "n_name"))
    costs = (
        ps.join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .join(su, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(nr, F.col("n_nationkey") == F.col("s_nationkey"))
        .withColumn(
            "min_cost",
            F.min("ps_supplycost").over(Window.partitionBy("p_partkey")),
        )
    )
    return costs.filter(F.col("ps_supplycost") == F.col("min_cost")).select(
        "p_partkey",
        "s_suppkey",
        "s_name",
        "n_name",
        F.col("ps_supplycost").alias("supplycost"),
    )


@register(
    "agg_important_stock",
    f"""
    WITH {_PS_SQL}, natps AS (
      SELECT ps_partkey,
             ps_cost_e4 * CAST(ps_qty AS BIGINT) AS value_e4
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
    )
    SELECT ps_partkey,
           CAST(sum(value_e4) AS DOUBLE) / 10000.0 AS stock_value
    FROM natps
    GROUP BY 1
    -- fixed fraction 0.0001 (q11 intent is 0.0001/SF; SF-scaling returned
    -- 0 rows at these test SFs); sum(BIGINT) is HUGEINT here so the
    -- multiply is 128-bit exact, matching Spark's decimal(38,0) compare
    HAVING sum(value_e4) * 10000 > (SELECT sum(value_e4) FROM natps)
    """,
)
def agg_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 (important stock): per-part inventory value within one
    nation, kept when above a fraction of the national total. The global
    scalar is a one-row aggregate broadcast in. All value arithmetic is
    BIGINT fixed-point (cost in e4 units × integral quantity), so sums
    are exact and accumulation-order-free, and the HAVING fraction
    ``sum > total·0.0001`` is the pure integer predicate
    ``sum·10000 > total`` (TPC-H q11's SF-scaled fraction intent: the
    0.001 fraction returned 0 rows at sf0.1 where no single part holds
    0.1% of 20k parts' stock) — zero float rounding anywhere in the
    comparison path (the r3 hash mismatch was ``round(sum(double),4)``
    disagreeing between engines at a half boundary). The displayed
    stock_value is one exact int→double division (values ≪ 2⁵³). Two
    passes over the (already nation-filtered) ps frame — the
    de-correlated plan the reference optimizer also picks."""
    ps = _derived_partsupp(spark, sf_dir)
    su = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        read_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    natps = (
        ps.join(su, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_cost_e4") * F.col("ps_qty").cast("long")).alias("value_e4"),
        )
    )
    total = natps.agg(F.sum("value_e4").alias("total_e4"))
    return (
        natps.groupBy("ps_partkey")
        .agg(F.sum("value_e4").alias("sum_e4"))
        .join(F.broadcast(total))
        # decimal(38,0) comparison: sum_e4·10000 can exceed int64 at very
        # large SF (silent wraparound under non-ANSI overflow) while the
        # DuckDB oracle's sum(BIGINT) promotes to 128-bit HUGEINT — widen to
        # decimal so both engines compare exactly at any scale factor.
        .filter(
            F.col("sum_e4").cast("decimal(38,0)") * 10000
            > F.col("total_e4").cast("decimal(38,0)")
        )
        .select(
            "ps_partkey",
            (F.col("sum_e4").cast("double") / 10000.0).alias("stock_value"),
        )
    )


@register(
    "agg_supplier_part_counts",
    f"""
    WITH {_PS_SQL}
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def agg_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 (parts/supplier relationship): distinct supplier counts
    per (brand, type, size) with a brand/type exclusion and a supplier
    denylist. The original's comment-text denylist becomes an arrears
    test (s_acctbal < 0 — the column that exists); NOT IN plans as a
    left_anti against the 6-row denylist (broadcast)."""
    ps = _derived_partsupp(spark, sf_dir)
    p = (
        read_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & ~F.col("p_type").like("PROMO%")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    denylist = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            F.broadcast(denylist),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "agg_excess_inventory_suppliers",
    f"""
    WITH {_PS_SQL}, shipped AS (
      SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_shipped
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation ON n_nationkey = s.s_nationkey AND n_name = 'NATION_2'
    WHERE s.s_suppkey IN (
      SELECT ps_suppkey FROM ps
      JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
      JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE ps_qty > half_shipped)
    """,
)
def agg_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 (excess inventory): suppliers in one nation whose derived
    availability of LIKE-filtered parts exceeds half the quantity they
    shipped in a year. IN → left_semi join; the quantity comparison is
    exact (integral quantities sum exactly in doubles). ps and the
    year-shipped aggregate are two grouped passes over lineitem — the
    de-correlated form of the original's nested EXISTS chain."""
    ps = _derived_partsupp(spark, sf_dir)
    li = read_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((0.5 * F.sum("l_quantity")).alias("half_shipped"))
    )
    red_parts = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    excess = (
        ps.join(F.broadcast(red_parts), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_qty") > F.col("half_shipped"))
        .select("ps_suppkey")
    )
    su = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = F.broadcast(
        read_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_2")
        .select("n_nationkey")
    )
    return (
        su.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "agg_pareto_abc",
    """
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS r4
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(r4) AS BIGINT) AS total4 FROM rev
    ), ranked AS (
      SELECT l_partkey, r4,
             CAST(sum(r4) OVER (ORDER BY r4 DESC, l_partkey ASC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum4
      FROM rev
    ), classed AS (
      SELECT l_partkey, r4,
             CASE WHEN cum4 * 5 <= total4 * 4 THEN 'A'
                  WHEN cum4 * 20 <= total4 * 19 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked CROSS JOIN tot
    )
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           floor(sum(r4) / 100.0 + 0.5) / 100.0 AS class_revenue
    FROM classed GROUP BY abc
    """,
)
def agg_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: parts ranked by revenue, classified by
    cumulative share (A ≤ 80%, B ≤ 95%, C rest) — the 80/20 inventory
    segmentation. INTEGER end-to-end (SCALING.md doctrine, advice r5):
    prices carry 2 decimals and discounts 2, so
    ``round(price·100)·round((1−disc)·100)`` is the revenue in exact
    10⁻⁴-dollar units — per-part sums, the cumulative sum, and the
    80 %/95 % class boundaries (``cum·5 ≤ total·4``, ``cum·20 ≤
    total·19`` — reduced fractions keep ~5×10¹⁷ of BIGINT headroom) are
    comparisons with no float anywhere near a predicate; a float sum here
    is combine-order-dependent and was measured flipping A/B/C at the
    boundary between engines. Reported revenue divides the exact integer
    by 10⁴ at the very end (fits a double exactly until ~9×10¹¹ dollars
    per class). The cumulative sum is the two-phase distributed prefix
    (``operators.ranking.ordered_prefix``) over the post-agg part table,
    never a single-partition window; the corpus total joins back as a
    one-row broadcast."""
    from datamodel_clinicaldata_spark.operators.ranking import ordered_prefix

    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc4 = F.floor((1 - F.col("l_discount")) * 100 + F.lit(0.5)).cast("long")
    rev = li.groupBy("l_partkey").agg(F.sum(cents * disc4).cast("long").alias("r4"))
    # r13: counted-small adaptive path (pagerank doctrine) — below 2M
    # measured rows ONE bounded window beats the two-phase machinery's 3
    # extra jobs; above, the distributed path runs unchanged. Alternating
    # A/B at sf0.1: 6.98 → 4.77 s (OPTIMIZATION_r13.md).
    ranked = ordered_prefix(
        rev,
        [F.col("r4").desc(), F.col("l_partkey").asc()],
        running_sum={"r4": "cum4"},
        count_small=2_000_000,
    )
    tot = rev.agg(F.sum("r4").cast("long").alias("total4"))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "r4",
        F.when(F.col("cum4") * 5 <= F.col("total4") * 4, "A")
        .when(F.col("cum4") * 20 <= F.col("total4") * 19, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        (F.floor(F.sum("r4") / 100.0 + F.lit(0.5)) / 100.0).alias("class_revenue"),
    )


@register(
    "diag_order_total_consistency",
    """
    WITH recomputed AS (
      SELECT l_orderkey,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS line_total
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN abs(o.o_totalprice - r.line_total) <= 0.01
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
           round(max(abs(o.o_totalprice - r.line_total)), 2) AS max_abs_diff
    FROM orders o JOIN recomputed r ON r.l_orderkey = o.o_orderkey
    """,
)
def diag_order_total_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table invariant audit: o_totalprice recomputed from its line
    items (extended price net of discount, gross of tax — the TPC-H
    generation invariant) and compared within a cent — the load check
    that catches partial line-item loads or double-applied discounts.
    DECIMAL arithmetic end-to-end, so sums are exact and order-free; one
    co-keyed aggregation + join."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    rec = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("line_total")
    )
    j = o.join(rec, F.col("l_orderkey") == F.col("o_orderkey"))
    diff = F.abs(F.col("o_totalprice") - F.col("line_total"))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum((diff <= 0.01).cast("long")).cast("long").alias("n_consistent"),
        F.round(F.max(diff), 2).alias("max_abs_diff"),
    )
