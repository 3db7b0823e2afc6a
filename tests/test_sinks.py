"""Sink/layout tests: partitioned writes prune at read time, bucketed
tables join shuffle-free, salted joins reproduce plain-join results."""

from __future__ import annotations

from pyspark.sql import functions as F

from datamodel_clinicaldata_spark.operators.joins import salted_join
from datamodel_clinicaldata_spark.plans.audit import audit
from datamodel_clinicaldata_spark.sources.readers import read_table
from datamodel_clinicaldata_spark.sources.writers import (
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_priority")
    o = read_table(spark, sf_dir, "orders")
    write_partitioned(o, out, ["o_orderpriority"])

    back = spark.read.parquet(out)
    assert back.count() == o.count()

    pruned = back.filter(F.col("o_orderpriority") == "1-URGENT")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must hit the directory layout, not the row filter
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan
    want = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert pruned.count() == want


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    write_bucketed(c, "c_bkt", "c_custkey", num_buckets=8, sort_by="c_custkey")
    write_bucketed(o, "o_bkt", "o_custkey", num_buckets=8, sort_by="o_custkey")

    cb, ob = spark.table("c_bkt"), spark.table("o_bkt")
    joined = cb.join(ob, cb["c_custkey"] == ob["o_custkey"]).select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )
    # co-located: the bucketed scans satisfy the join clustering — no
    # Exchange anywhere in the plan (broadcast would also pass; forbid it
    # to prove bucket co-location specifically).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cb.join(ob, cb["c_custkey"] == ob["o_custkey"]).select(
            "c_custkey", "o_orderkey", "o_totalprice"
        )
        a = audit(joined)
        assert a.exchanges == 0
        assert a.broadcast_exchanges == 0
        assert a.sort_merge_joins == 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # values match the unbucketed join
    plain = c.join(o, c["c_custkey"] == o["o_custkey"]).select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    salted = salted_join(c, o, "c_custkey", "o_custkey", salt=4)
    plain = c.join(o, c["c_custkey"] == o["o_custkey"])
    cols = ["c_custkey", "o_orderkey"]
    assert sorted(tuple(r[k] for k in cols) for r in salted.collect()) == sorted(
        tuple(r[k] for k in cols) for r in plain.collect()
    )


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """documents → JSONL → read back with explicit schema == original."""
    from datamodel_clinicaldata_spark.sources.readers import read_jsonl, read_table
    from datamodel_clinicaldata_spark.sources.writers import write_jsonl

    d = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(d, path)
    back = read_jsonl(spark, path, schema=d.schema)
    assert back.schema == d.schema
    a = {tuple(r) for r in d.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """orders → ORC → filtered read pushes the predicate to the ORC scan."""
    from datamodel_clinicaldata_spark.plans.audit import audit
    from datamodel_clinicaldata_spark.sources.readers import read_orc, read_table
    from datamodel_clinicaldata_spark.sources.writers import write_orc

    o = read_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(o, path)
    back = read_orc(spark, path).filter(F.col("o_totalprice") > 100000).select(
        "o_orderkey", "o_totalprice"
    )
    scan = audit(back).scan_for("orders_orc")
    assert any("o_totalprice" in f for f in scan["pushed_filters"])
    assert back.count() == o.filter(F.col("o_totalprice") > 100000).count()


def test_sorted_layout_enables_file_skipping(spark, sf_dir, tmp_path):
    """write_sorted_parquet produces non-overlapping per-file o_orderdate
    ranges (verified from the parquet footers via pyarrow) — the property
    that lets a key filter skip whole files."""
    import glob

    import pyarrow.parquet as pq

    from datamodel_clinicaldata_spark.sources.readers import read_table
    from datamodel_clinicaldata_spark.sources.writers import write_sorted_parquet

    o = read_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_sorted")
    write_sorted_parquet(o, path, ["o_orderdate"], n_files=4)

    ranges = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # files do not overlap on the sort key


def test_compact_small_files(spark, sf_dir, tmp_path):
    """Fragmented input (64 partitions) compacts to the expected file
    count with all rows intact."""
    import glob

    from datamodel_clinicaldata_spark.sources.readers import read_table
    from datamodel_clinicaldata_spark.sources.writers import compact_small_files

    c = read_table(spark, sf_dir, "customer").repartition(64)
    path = str(tmp_path / "customer_compacted")
    n_rows = c.count()
    compact_small_files(c, path, target_rows_per_file=1000)
    files = glob.glob(path + "/*.parquet")
    assert len(files) == max(1, -(-n_rows // 1000))
    assert spark.read.parquet(path).count() == n_rows


def test_schema_evolution_merge(spark, sf_dir, tmp_path):
    """Appended data with an added column reads back via mergeSchema with
    nulls for pre-evolution rows — additive drift, the only kind a
    long-lived corpus layout should allow."""
    from datamodel_clinicaldata_spark.sources.readers import read_table

    path = str(tmp_path / "evolving")
    d = read_table(spark, sf_dir, "documents")
    d.select("doc_id", "text").write.mode("overwrite").parquet(path)
    d.select("doc_id", "text", "lang").limit(10).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    n = d.count()
    assert merged.count() == n + 10
    assert merged.filter(F.col("lang").isNull()).count() == n


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    """foreachBatch: the escape hatch for sinks Spark lacks natively —
    each micro-batch lands through a custom writer (here: partitioned
    parquet keyed by batch id, the idempotent-restart layout: a replayed
    batch overwrites its own directory instead of duplicating rows)."""
    import os

    from datamodel_clinicaldata_spark.streaming.windows import stream_events

    out = str(tmp_path / "batches")

    def write_batch(df, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out, f"batch={batch_id}"))

    q = (
        stream_events(spark, sf_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from datamodel_clinicaldata_spark.sources.readers import read_table

    got = spark.read.parquet(out)
    assert got.count() == read_table(spark, sf_dir, "events").count()


def test_asof_nearest_direction_and_ties(spark):
    """nearest as-of: closer side wins, exact |Δt| tie goes backward,
    one-sided anchors fall back to the populated side."""
    import datetime as dt

    from datamodel_clinicaldata_spark.operators.joins import asof_join

    T0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return T0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, ts(10), "closer_back"), (1, ts(20), "tie"), (1, ts(1), "only_fwd"),
         (2, ts(10), "no_events")],
        "k int, at timestamp, label string",
    )
    right = spark.createDataFrame(
        [(1, ts(9), 100), (1, ts(12), 200), (1, ts(25), 300), (1, ts(15), 400)],
        "k int, rts timestamp, rid int",
    )
    out = {
        r.label: (r.rid, r.rts)
        for r in asof_join(
            left, right, "k", "k", "at", "rts", ["rid"], direction="nearest"
        ).collect()
    }
    assert out["closer_back"][0] == 100          # Δ back 1 min < Δ fwd 2 min
    assert out["tie"][0] == 400                  # 15 vs 25: back Δ5 == fwd Δ5 → backward
    assert out["only_fwd"][0] == 100             # nothing at/before 1 min → forward
    assert "no_events" not in out                # inner drops unmatched keys


def test_asof_nearest_date_typed(spark):
    """nearest on DateType as-of columns: the numeric fallback can't cast
    dates to double, so the distance uses the exact day ordinal
    (unix_date) — previously this failed at plan time even though
    backward/forward handled dates fine."""
    import datetime as dt

    from datamodel_clinicaldata_spark.operators.joins import asof_join

    d = dt.date
    left = spark.createDataFrame(
        [(1, d(2024, 1, 10), "mid"), (1, d(2024, 1, 2), "early")],
        "k int, at date, label string",
    )
    right = spark.createDataFrame(
        [(1, d(2024, 1, 1), 10), (1, d(2024, 1, 13), 20)],
        "k int, rts date, rid int",
    )
    out = {
        r.label: r.rid
        for r in asof_join(
            left, right, "k", "k", "at", "rts", ["rid"], direction="nearest"
        ).collect()
    }
    assert out == {"mid": 20, "early": 10}  # Δ3 < Δ9; Δ1 < Δ11


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order vs round-robin layout, measured on the actual parquet
    footers: for a small 2-D query box (one user band × one time band),
    far fewer z-ordered files have min/max boxes intersecting the
    predicate — the file-skip a 100 TB scan lives on. Row-level
    correctness round-trips identically from both layouts."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from datamodel_clinicaldata_spark.sources.readers import read_table
    from datamodel_clinicaldata_spark.sources.writers import write_zordered

    e = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t_us"), "value"
    )
    lo_t, hi_t, lo_u, hi_u = e.agg(
        F.min("t_us"), F.max("t_us"), F.min("user_id"), F.max("user_id")
    ).collect()[0]

    zdir, rdir = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(
        e, zdir, ["user_id", "t_us"],
        [(lo_u, hi_u), (lo_t, hi_t)], n_files=16,
    )
    e.repartition(16).write.parquet(rdir)  # round-robin: every file spans all

    # query box: middle eighth of each dimension
    u_a, u_b = lo_u + (hi_u - lo_u) * 4 // 8, lo_u + (hi_u - lo_u) * 5 // 8
    t_a, t_b = lo_t + (hi_t - lo_t) * 4 // 8, lo_t + (hi_t - lo_t) * 5 // 8

    # (simpler: aggregate per-file min/max via pyarrow column stats)
    def file_boxes(d):
        boxes = []
        for f in sorted(glob.glob(d + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins: dict[str, int] = {}
            maxs: dict[str, int] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    st = col.statistics
                    if st is None or col.path_in_schema not in ("user_id", "t_us"):
                        continue
                    n = col.path_in_schema
                    mins[n] = st.min if n not in mins else min(mins[n], st.min)
                    maxs[n] = st.max if n not in maxs else max(maxs[n], st.max)
            if mins:
                boxes.append((mins["user_id"], maxs["user_id"], mins["t_us"], maxs["t_us"]))
        return boxes

    def hits(boxes):
        return sum(
            1
            for (ul, uh, tl, th) in boxes
            if not (uh < u_a or ul > u_b or th < t_a or tl > t_b)
        )

    zb, rb = file_boxes(zdir), file_boxes(rdir)
    assert len(zb) >= 8 and len(rb) >= 8
    assert hits(rb) == len(rb)  # round-robin: every file intersects the box
    assert hits(zb) <= len(zb) // 2  # z-order: most files skipped on footers

    # correctness: both layouts return the identical filtered rows
    pred = (
        (F.col("user_id").between(u_a, u_b)) & (F.col("t_us").between(t_a, t_b))
    )
    truth = e.filter(pred).select("event_id")
    got = spark.read.parquet(zdir).filter(pred).select("event_id")
    assert got.exceptAll(truth).isEmpty() and truth.exceptAll(got).isEmpty()


def test_python_datasource_synthetic_events(spark):
    """The Spark 4 Python DataSource API: the synthetic-events source
    reads through the normal format() surface with partition-level
    parallelism, deterministically (same options → identical bytes),
    and splitting changes nothing."""
    from pyspark.sql import functions as F

    from datamodel_clinicaldata_spark.sources.pydatasource import (
        SyntheticEventsDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    rd = (
        spark.read.format("synthetic_events")
        .option("rows", 5000)
        .option("partitions", 8)
        .option("seed", 42)
    )
    df = rd.load()
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 8
    s1 = df.agg(
        F.sum("event_id").alias("se"), F.sum("user_id").alias("su"),
        F.countDistinct("event_type").alias("t"),
    ).collect()[0]
    assert s1["se"] == 5000 * 4999 // 2 and s1["t"] == 5
    # re-read with a different partition count: identical content
    df2 = (
        spark.read.format("synthetic_events")
        .option("rows", 5000)
        .option("partitions", 3)
        .option("seed", 42)
        .load()
    )
    assert df.exceptAll(df2).isEmpty() and df2.exceptAll(df).isEmpty()


def test_synthetic_gen_vectorized_matches_scalar_recurrence():
    """The Arrow-vectorized generator must be BIT-identical to the scalar
    per-row LCG recurrence it replaced (uint64 wraparound == mod 2^64):
    fixtures generated at any scale stay stable across the change."""
    from datamodel_clinicaldata_spark.sources.pydatasource import (
        _EVENT_TYPES,
        _MIX,
        _gen_batches,
        _lcg,
    )

    lo, hi, seed, users = 123, 1123, 42, 97
    got = []
    for rb in _gen_batches(lo, hi, seed, users, batch=256):
        d = rb.to_pydict()
        got.extend(
            zip(d["event_id"], d["user_id"], d["event_type"], d["value"])
        )
    exp = []
    for i in range(lo, hi):
        s = _lcg(seed * _MIX + i)
        user = s % users
        s = _lcg(s)
        etype = _EVENT_TYPES[s % len(_EVENT_TYPES)]
        s = _lcg(s)
        exp.append((i, user, etype, (s % 1_000_000) / 1000.0))
    assert got == exp


def test_asof_tolerance_backward_forward(spark):
    """merge_asof-style tolerance: the pick survives iff its distance is
    within the bound; inner drops, left nulls. Equivalence with
    candidate pre-filtering holds because the pick is already the
    closest candidate on its side."""
    import datetime as dt

    from datamodel_clinicaldata_spark.operators.joins import asof_join

    T0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return T0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, ts(10), "fresh"), (1, ts(100), "stale"), (1, ts(12), "edge")],
        "k int, at timestamp, label string",
    )
    right = spark.createDataFrame(
        [(1, ts(9), 100)], "k int, rts timestamp, rid int"
    )
    tol_us = 3 * 60 * 1_000_000  # 3 minutes
    inner = {
        r.label: r.rid
        for r in asof_join(
            left, right, "k", "k", "at", "rts", ["rid"], tolerance=tol_us
        ).collect()
    }
    assert inner == {"fresh": 100, "edge": 100}  # Δ1 and Δ3 (inclusive) pass
    lefted = {
        r.label: r.rid
        for r in asof_join(
            left, right, "k", "k", "at", "rts", ["rid"],
            how="left", tolerance=tol_us,
        ).collect()
    }
    assert lefted["stale"] is None and lefted["fresh"] == 100


def test_asof_tolerance_nearest_side_fallback(spark):
    """nearest + tolerance: an out-of-tolerance nearer side must NOT
    shadow an in-tolerance farther side — the bound applies per side
    before the closer-of-two choice."""
    import datetime as dt

    from datamodel_clinicaldata_spark.operators.joins import asof_join

    T0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return T0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, ts(10), "anchor")], "k int, at timestamp, label string"
    )
    # backward match at Δ9 (closer), forward at Δ5 — with tol 6 the
    # backward side is out, forward must win even though... reversed:
    right = spark.createDataFrame(
        [(1, ts(1), 100), (1, ts(15), 200)], "k int, rts timestamp, rid int"
    )
    out = asof_join(
        left, right, "k", "k", "at", "rts", ["rid"],
        direction="nearest", tolerance=6 * 60 * 1_000_000,
    ).collect()
    assert len(out) == 1 and out[0].rid == 200  # back Δ9 out; fwd Δ5 in
