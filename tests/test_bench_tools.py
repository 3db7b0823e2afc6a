"""Bench-hygiene tooling tests (no Spark session needed).

record_bench_baseline's load gate is what stale-proofs every following
round's vs_prev comparison (verdict r9 #9), and its min-of-N promotion
is what keeps intra-window hypervisor steal bursts out of the promoted
baseline (verdict r10 #1) — pin the refusal paths, the ≥2-run
requirement, the per-cell minima, and the provenance stamp so a future
edit can't silently drop any of them.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def _run(tmp_path, monkeypatch, outs, argv=()):
    """Write each record in ``outs`` (first → bench_out.json, rest →
    bench_run_N.json) and invoke the promotion CLI."""
    import record_bench_baseline as rbb

    monkeypatch.setattr(rbb, "ROOT", str(tmp_path))
    if isinstance(outs, dict):
        outs = [outs]
    for i, out in enumerate(outs):
        name = "bench_out.json" if i == 0 else f"bench_run_{i}.json"
        with open(tmp_path / name, "w") as fh:
            json.dump(out, fh)
    monkeypatch.setattr(sys, "argv", ["record_bench_baseline.py", *argv])
    return rbb.main()


def _bench_record(start_load, mid_load, medians=None, noisy=(), **over):
    rec = {
        "value": 70.0,
        "queries_median": medians or {"q1": 1.0, "q2": 2.0},
        "sf": 0.1,
        "git_sha": "abc123def456",
        "host": {
            "loadavg_at_start": [start_load, 0.0, 0.0],
            "loadavg_mid_headline_max": mid_load,
            "canary": {
                "noisy_queries": list(noisy),
                "mp": {"floor_ms": 110.0, "degraded_queries": []},
            },
        },
    }
    rec.update(over)
    return rec


def test_promotion_refused_under_load(tmp_path, monkeypatch):
    # mid-load backstop (r11: 24.0 — bench self-load under steal reads
    # 15-21; only external work pushes past) → no eligible contributor
    assert _run(tmp_path, monkeypatch, _bench_record(0.1, 26.0)) == 2
    assert not (tmp_path / "bench_baseline.json").exists()
    # pre-existing contention at start → refused even with a quiet mid
    assert _run(tmp_path, monkeypatch, _bench_record(9.0, 10.0)) == 2
    # exhausted canary budget = ungated timings → refused
    exhausted = _bench_record(0.1, 10.0)
    exhausted["host"]["canary"]["budget_exhausted"] = True
    assert _run(tmp_path, monkeypatch, exhausted) == 2
    # --force overrides (single contaminated run, provenance marks it)
    assert _run(tmp_path, monkeypatch, _bench_record(0.1, 26.0), ["--force"]) == 0
    with open(tmp_path / "bench_baseline.json") as fh:
        assert json.load(fh)["provenance"]["forced"] is True


def test_promotion_requires_two_gated_runs(tmp_path, monkeypatch):
    # ONE clean run is not baseline material under min-of-N (r10 #1):
    # a burst inside its timed windows would be unfalsifiable
    assert _run(tmp_path, monkeypatch, _bench_record(0.1, 10.0)) == 3
    assert not (tmp_path / "bench_baseline.json").exists()
    # a loaded sibling doesn't count toward the two
    assert (
        _run(
            tmp_path,
            monkeypatch,
            [_bench_record(0.1, 10.0), _bench_record(0.1, 26.0)],
        )
        == 3
    )


def test_promotion_takes_per_cell_minima(tmp_path, monkeypatch):
    runs = [
        _bench_record(0.1, 10.0, {"q1": 1.0, "q2": 9.0, "q3": 2.0}),
        _bench_record(0.2, 9.0, {"q1": 1.2, "q2": 2.0, "q3": 2.1}),
    ]
    assert _run(tmp_path, monkeypatch, runs, ["11"]) == 0
    with open(tmp_path / "bench_baseline.json") as fh:
        base = json.load(fh)
    assert base["round"] == 11
    # each cell independently min'd — NOT one winning run's row; the key
    # is queries_min since r12 (they ARE floors, not medians — ADVICE r11)
    assert base["queries_min"] == {"q1": 1.0, "q2": 2.0, "q3": 2.0}
    assert base["git_sha"] == "abc123def456"
    assert base["sf"] == 0.1
    prov = base["provenance"]
    assert [c["source"] for c in prov["contributors"]] == [
        "bench_out.json",
        "bench_run_1.json",
    ]
    # q2's 4.5× spread is the residual-contamination tripwire
    assert prov["high_spread_cells"] == {"q2": 4.5}
    assert prov["forced"] is False


def test_promotion_refused_on_canary_noise(tmp_path, monkeypatch):
    # hypervisor-noise canary (r10): many windows without a clean run
    # set → that run is not a contributor even though loadavg looked fine
    noisy = _bench_record(0.1, 10.0, noisy=[f"q{i}" for i in range(9)])
    assert _run(tmp_path, monkeypatch, [noisy, noisy]) == 2
    ok = _bench_record(0.1, 10.0, noisy=["q1", "q2"])
    assert _run(tmp_path, monkeypatch, [ok, ok]) == 0


def test_promotion_refused_on_missing_provenance(tmp_path, monkeypatch):
    """A record without the canary block, without a git_sha stamp, or
    marked budget-degraded is not baseline material (ADVICE r11: absence
    of the primary contamination instrument must gate like failure, and
    unstamped/stale records must not fold into new minima)."""
    ok = _bench_record(0.1, 10.0)
    no_canary = _bench_record(0.1, 10.0)
    del no_canary["host"]["canary"]
    assert _run(tmp_path, monkeypatch, [ok, no_canary]) == 3
    unstamped = _bench_record(0.1, 10.0, git_sha=None)
    assert _run(tmp_path, monkeypatch, [ok, unstamped]) == 3
    partial = _bench_record(0.1, 10.0, partial=True)
    assert _run(tmp_path, monkeypatch, [ok, partial]) == 3
    truncated = _bench_record(
        0.1, 10.0, budget={"truncated_after": "q1", "cold_cells": []}
    )
    assert _run(tmp_path, monkeypatch, [ok, truncated]) == 3
    cold = _bench_record(
        0.1, 10.0, budget={"truncated_after": None, "cold_cells": ["q2"]}
    )
    assert _run(tmp_path, monkeypatch, [ok, cold]) == 3
    # parallel-canary evidence (r12): absent mp block, or too many
    # mp-degraded windows, is not baseline material either
    no_mp = _bench_record(0.1, 10.0)
    no_mp["host"]["canary"]["mp"] = None
    assert _run(tmp_path, monkeypatch, [ok, no_mp]) == 3
    mp_degraded = _bench_record(0.1, 10.0)
    mp_degraded["host"]["canary"]["mp"]["degraded_queries"] = [
        f"q{i}" for i in range(9)
    ]
    assert _run(tmp_path, monkeypatch, [ok, mp_degraded]) == 3


def test_promotion_refused_on_mismatched_runs(tmp_path, monkeypatch):
    """Min-of-N across runs is only meaningful when every contributor
    measured the same code at the same scale (ADVICE r11: a leftover
    sf=1 or old-sha run would promote incomparable per-cell minima)."""
    a = _bench_record(0.1, 10.0)
    other_sf = _bench_record(0.1, 10.0, sf=1.0)
    assert _run(tmp_path, monkeypatch, [a, other_sf]) == 3
    other_sha = _bench_record(0.1, 10.0, git_sha="feedfeedfeed")
    assert _run(tmp_path, monkeypatch, [a, other_sha]) == 3
    # matched pair still promotes
    assert _run(tmp_path, monkeypatch, [a, _bench_record(0.2, 9.0)]) == 0


def test_choose_repeats_fair_share():
    """Budget-degradation ladder (verdict r11 #1): unlimited budget →
    full best-of-N; tight budget → fewer repeats, floored at 1 — the
    caller handles truncation, this function never returns 0."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    assert bench._choose_repeats(float("inf"), 50, 3.0, 5) == 5
    # 500 s for 100 queries at ~1 s/run → 5 repeats fit the fair share
    assert bench._choose_repeats(500, 100, 1.0, 5) == 5
    # 100 s for 100 queries at ~1 s/run → share is 1 run
    assert bench._choose_repeats(100, 100, 1.0, 5) == 1
    # never 0, even when the share can't fit one run
    assert bench._choose_repeats(1, 100, 5.0, 5) == 1
    # cheap queries keep full statistics under the same tight budget
    assert bench._choose_repeats(100, 100, 0.05, 5) == 5


def test_flush_is_atomic(tmp_path):
    """A kill (or serialization crash) mid-flush must leave the previous
    complete JSON in place (verdict r11 #2: a mid-loop timeout used to
    yield nothing; with tmp+os.replace any instant's file is parseable)."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    out = tmp_path / "bench_out.json"
    bench._flush(str(out), {"queries": {"q1": 1.0}, "partial": True})
    with open(out) as fh:
        assert json.load(fh)["partial"] is True
    # a crash mid-serialization (unserializable object) must not tear
    # the artifact: json.dump dies after partially writing the TMP file
    try:
        bench._flush(str(out), {"queries": {"q1": object()}})
    except TypeError:
        pass
    with open(out) as fh:
        assert json.load(fh) == {"queries": {"q1": 1.0}, "partial": True}


def test_local_dir_sweep_is_locked_and_age_gated(tmp_path):
    """/dev/shm sweep race (ADVICE r11): a just-starting session's
    shuffle dir (young mtime) must survive a concurrent sweep, a crashed
    run's orphan (old mtime) must be reclaimed, and a held lock must
    make the sweep a no-op entirely."""
    from datamodel_clinicaldata_spark.session import _sweep_stale_local_dir

    root = tmp_path / "spark_graft_local"
    root.mkdir()
    old = root / "orphan-from-crashed-run"
    old.mkdir()
    (old / "shuffle.data").write_text("x")
    os.utime(old, (0, 0))  # ancient
    fresh = root / "starting-session-dir"
    fresh.mkdir()

    _sweep_stale_local_dir(str(root), min_age_sec=120.0)
    assert not old.exists(), "stale orphan should be reclaimed"
    assert fresh.exists(), "young dir (concurrent session) must survive"
    assert not os.path.exists(str(root) + ".sweeplock"), "lock released"

    # held lock (another sweeper/starter active) → no-op, even for orphans
    old.mkdir()
    os.utime(old, (0, 0))
    with open(str(root) + ".sweeplock", "w"):
        pass
    _sweep_stale_local_dir(str(root), min_age_sec=120.0)
    assert old.exists(), "sweep must be a no-op while the lock is held"
    os.unlink(str(root) + ".sweeplock")


def test_host_noise_gate_floor_and_quiet(monkeypatch):
    """_HostNoiseGate semantics: floor is a running MIN (calibrating in
    a noise burst must not permanently loosen the gate), quiet = within
    ratio of the floor, wait_quiet returns the exit state."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    readings = iter(
        [200.0] * 7  # calibration lands in a burst: floor starts 200
        + [100.0]  # quiet host reading corrects the floor down to 100
        + [140.0]  # 1.4x of true floor: quiet under ratio 1.6
        + [900.0]  # burst: not quiet
        + [101.0]  # recovered
    )
    monkeypatch.setattr(bench, "_canary_ms", lambda: next(readings))
    gate = bench._HostNoiseGate(ratio=1.6, max_wait_sec=0.01)
    assert gate.floor_ms == 200.0
    assert gate._quiet() and gate.floor_ms == 100.0  # min-tracked down
    assert gate._quiet()  # 140 <= 1.6 * 100
    assert not gate._quiet()  # 900 — burst detected
    assert gate.wait_quiet()  # recovers on the next reading


def test_gate_reports_reading_distribution(monkeypatch):
    """The artifact must carry median/p90 of ALL canary readings: a
    sustained degradation plateau passes the ratio gate (floor
    calibrates high) and only the distribution exposes it (r11)."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    # calibration sees the quiet floor; the host then sits on a 250 ms
    # plateau — each wait_quiet consumes 2 readings (initial + one
    # bounded retry), all of them unquiet
    readings = iter([100.0] * 7 + [250.0] * 8)
    monkeypatch.setattr(bench, "_canary_ms", lambda: next(readings))
    gate = bench._HostNoiseGate(ratio=1.6, max_wait_sec=0.01)
    for _ in range(4):
        assert not gate.wait_quiet()
    s = gate.stats()
    assert s["readings_n"] == 15
    assert s["floor_ms"] == 100.0
    assert s["median_ms"] == 250.0  # the plateau is visible in the record
    assert s["p90_ms"] == 250.0


def test_wait_quiet_charges_only_real_waiting(monkeypatch):
    """An immediately-quiet canary reading is measurement, not waiting —
    it must not erode the global wait budget (ADVICE r10)."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    monkeypatch.setattr(bench, "_canary_ms", lambda: 100.0)
    gate = bench._HostNoiseGate(ratio=1.6, max_wait_sec=0.01)
    for _ in range(50):
        assert gate.wait_quiet()
    assert gate.waited_sec == 0.0
    assert not gate.budget_exhausted()
