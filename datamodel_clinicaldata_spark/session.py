"""SparkSession factory with scale-aware defaults.

Local test runs use ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster — AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow transfer for the Pandas-UDF slow
path, UTC session timezone so timestamp semantics are stable across the
DuckDB oracle and any cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_local_dir() -> str | None:
    """RAM-backed shuffle/spill dir when the host can afford it.

    Shuffle files and sort-spills go to ``spark.local.dir``. On this
    containerized bench host the backing disk exhibits bursty multi-×
    write stalls (hypervisor contention — measured: the same shuffle
    stage at 0.7 s or 8.7 s run-to-run with identical plans), so local
    runs point local.dir at ``/dev/shm`` when it exists with ample
    headroom (≥ 48 GiB free — the measured probe-scale shuffle volume
    is < 5 GiB, so this is a wide margin). SF ceiling for the RAM dir:
    headroom is checked once at session build, so runs whose shuffle
    volume could approach the free-space margin (roughly sf ≥ 10 on the
    documented ~0.5 GiB-shuffle-per-sf-0.1 profile, or any 100M-row+
    probe) should set ``SPARK_GRAFT_LOCAL_DIR=`` (empty) to fall back to
    disk rather than risk mid-run ENOSPC on tmpfs. Stale contents from a
    crashed run are swept at startup (tmpfs pages count against RAM).
    On a real cluster this knob is instead provisioned as striped local
    NVMe per executor (the standard deployment guidance);
    ``SPARK_GRAFT_LOCAL_DIR`` overrides unconditionally, and an empty
    value opts out entirely."""
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env is not None:
        return env or None
    try:
        path = "/dev/shm/spark_graft_local"
        # tmpfs pages count against RAM: a crashed run's orphaned shuffle
        # files would otherwise consume memory forever AND shrink the
        # headroom this very check measures. No live Spark process on
        # this box means nothing under the dir is in use — sweep it
        # before checking headroom. (Best-effort: a concurrent session
        # in another process may hold files; ENOENT/EBUSY are ignored.)
        if os.path.isdir(path) and not _other_spark_running():
            _sweep_stale_local_dir(path)
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize >= 48 * (1 << 30):
            return path
    except OSError:
        pass
    return None


def _sweep_stale_local_dir(path: str, min_age_sec: float = 120.0) -> None:
    """Delete STALE entries under the shared /dev/shm local dir.

    Race (ADVICE r11): another Python driver that passed its own
    _other_spark_running check but has not yet forked its JVM is
    invisible to the cmdline scan — an unguarded sweep could delete
    shuffle dirs that session is about to use. Two guards:

    - an O_EXCL lock file serializes concurrent sweepers (a loser skips
      the sweep entirely; locks older than 10 min are treated as crashed
      and broken);
    - only entries whose mtime is older than ``min_age_sec`` are swept —
      a directory a just-starting session created moments ago is left
      alone even if that session's JVM isn't visible yet, while orphans
      from a crashed run (hours old) are reclaimed.
    """
    import shutil
    import time

    lock = path + ".sweeplock"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        try:
            st = os.stat(lock)
            if time.time() - st.st_mtime > 600:
                # Crashed sweeper: break the lock — but re-verify identity
                # first (ADVICE r12 TOCTOU: between getmtime and unlink
                # another process may have broken the stale lock AND
                # created a fresh one; unlinking that would admit two
                # sweepers). A stat identity check narrows the window to
                # ~µs; the residual race is tolerated because the
                # min_age mtime gate below makes the sweep idempotent —
                # the lock is best-effort serialization, the age gate is
                # the actual correctness guard.
                st2 = os.stat(lock)
                if (st2.st_ino, st2.st_mtime_ns) == (st.st_ino, st.st_mtime_ns):
                    os.unlink(lock)  # next caller retries
        except OSError:
            pass
        return
    except OSError:
        return
    try:
        now = time.time()
        for entry in os.listdir(path):
            p = os.path.join(path, entry)
            try:
                if now - os.path.getmtime(p) > min_age_sec:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                continue
    finally:
        os.close(fd)
        try:
            os.unlink(lock)
        except OSError:
            pass


def _other_spark_running() -> bool:
    """True if another live process on this host looks like a JVM/Spark
    driver (its shuffle dirs under /dev/shm must not be swept). Scans
    /proc cmdlines for 'java' outside our own pid; best-effort — any
    failure reports True (i.e. do NOT sweep)."""
    try:
        me = os.getpid()
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    cmd = fh.read()
            except OSError:
                continue
            if b"java" in cmd and b"spark" in cmd.lower():
                return True
        return False
    except OSError:
        return True


def _default_driver_mem() -> str:
    """min(48g, ~60% of MemAvailable), floored at 2g.

    Reads /proc/meminfo (Linux); on other platforms or parse failure,
    falls back to the 48g bench-host default.
    """
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(2, min(48, (avail_gb * 6) // 10))}g"
    except OSError:
        pass
    return "48g"


def get_spark(
    app_name: str = "datamodel_clinicaldata_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count: at local scale
    200 shuffle partitions (Spark's default) means 200 tiny tasks per
    exchange; on a real cluster this knob is instead sized so each shuffle
    partition lands in the 100-200 MB range. AQE's coalescePartitions then
    shrinks over-partitioned exchanges at runtime either way.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Driver testdata stores events.ts as parquet TIMESTAMP(NANOS),
        # which the vectorized reader rejects; read as long + convert in
        # sources.readers (Spark timestamps are µs precision anyway).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The engine stages multi-window pipelines in dependency order so
        # windows with byte-identical sort requirements sit adjacent and
        # share ONE in-partition sort (operators/windows.py). TransposeWindow
        # re-sinks any window whose partition keys are a subset of its
        # neighbor's (patient ⊂ treatment ⊂ cohort), wedging a cohort sort
        # between the patient/treatment pair → +1 full-data sort pass per
        # query (measured ~35% on the flagship pipeline at sf0.1).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.TransposeWindow",
        )
        # Untruncated FileScan metadata (default 100 chars cuts
        # PushedFilters mid-token) — the plan audits parse these lists.
        .config("spark.sql.maxMetadataStringLength", "10000")
        .config("spark.ui.enabled", "false")
        # local[N] runs executors INSIDE the driver JVM, so this one heap
        # serves all N task threads: 8g across 32 tasks (250 MB each) OOM'd
        # the 50M-row scale probe after a bench's worth of checkpoint
        # blocks. Default = min(48g, ~60% of MemAvailable) so the bench
        # host gets its 48g ≈ 1.5 GB/task (the ratio a real cluster's
        # executors would get) while a smaller / cgroup-limited machine
        # gets a heap the OS can actually back instead of an OOM-kill
        # (ADVICE r7). SPARK_GRAFT_DRIVER_MEM overrides unconditionally.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        # ObjectHashAggregate (collect_list/collect_set — the postings
        # builds across the dedup/text families) falls back to SORT-BASED
        # aggregation with a disk spill after only 128 distinct keys per
        # task (Spark's default fallbackThreshold), so every postings
        # aggregate was paying a per-task spill regardless of memory
        # headroom. Entries here are (key, small-array) pairs and
        # per-task group cardinality is bounded by shuffle partition
        # sizing (the 100-200 MB/partition doctrine), so a multi-million
        # entry in-memory map is the right trade on any host with real
        # executor memory; 4M keeps worst-case map memory bounded
        # (~hundreds of MB) while removing the spill from every measured
        # plan. Same knob ships unchanged to a cluster.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "4000000",
        )
    )
    local_dir = _default_local_dir()
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # Deployment-parameterized overrides (guide §1.2 step 3: config last,
    # measured): SPARK_GRAFT_EXTRA_CONF="k=v;k=v" lets an A/B harness or a
    # cluster deployment adjust conf without code edits; applied BEFORE
    # extra_conf so explicit callers still win.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for item in env_conf.split(";"):
        if "=" in item:
            k, v = item.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
