"""Bench-hygiene tooling tests (no Spark session needed).

record_bench_baseline's load gate is what stale-proofs every following
round's vs_prev comparison (verdict r9 #9) — pin the refusal and the
provenance stamp so a future edit can't silently drop either.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def _run(tmp_path, monkeypatch, out, argv=()):
    import record_bench_baseline as rbb

    monkeypatch.setattr(rbb, "ROOT", str(tmp_path))
    with open(tmp_path / "bench_out.json", "w") as fh:
        json.dump(out, fh)
    monkeypatch.setattr(sys, "argv", ["record_bench_baseline.py", *argv])
    return rbb.main()


def _bench_record(start_load, mid_load):
    return {
        "value": 70.0,
        "queries_median": {"q1": 1.0, "q2": 2.0},
        "host": {
            "loadavg_at_start": [start_load, 0.0, 0.0],
            "loadavg_mid_headline_max": mid_load,
        },
    }


def test_promotion_refused_under_load(tmp_path, monkeypatch):
    # loaded measurement window (the r9 failure regime) → refused
    assert _run(tmp_path, monkeypatch, _bench_record(0.1, 22.0)) == 2
    assert not (tmp_path / "bench_baseline.json").exists()
    # pre-existing contention at start → refused even with a quiet mid
    assert _run(tmp_path, monkeypatch, _bench_record(9.0, 10.0)) == 2
    # --force overrides
    assert _run(tmp_path, monkeypatch, _bench_record(0.1, 22.0), ["--force"]) == 0


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


def test_promotion_refused_on_canary_noise(tmp_path, monkeypatch):
    # hypervisor-noise canary (r10): many windows without a clean run
    # set → refused even though loadavg looked fine
    rec = _bench_record(0.1, 10.0)
    rec["host"]["canary"] = {"noisy_queries": [f"q{i}" for i in range(9)]}
    assert _run(tmp_path, monkeypatch, rec) == 2
    rec["host"]["canary"]["noisy_queries"] = ["q1", "q2"]
    assert _run(tmp_path, monkeypatch, rec) == 0


def test_promotion_stamps_provenance(tmp_path, monkeypatch):
    assert _run(tmp_path, monkeypatch, _bench_record(0.2, 10.5), ["10"]) == 0
    with open(tmp_path / "bench_baseline.json") as fh:
        base = json.load(fh)
    assert base["round"] == 10
    assert base["queries_median"] == {"q1": 1.0, "q2": 2.0}
    prov = base["provenance"]
    assert prov["source"] == "bench_out.json"
    assert prov["headline_total"] == 70.0
    assert prov["host"]["loadavg_mid_headline_max"] == 10.5
