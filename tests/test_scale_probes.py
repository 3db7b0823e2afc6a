"""Small-size enforcement of the bench scale probes' exactness gates.

bench.py runs the probes best-effort (a probe failure WARNs rather than
failing the bench), so a silent regression in a probe's operator shape
or its gate would only surface as a missing artifact block. These tests
run the round-9 probes at small sizes where the gates must hold exactly
— if a gate goes false here, the probe (or the operator it measures) is
broken, not noisy.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)


def test_label_propagation_probe_recovers_planted_communities(spark):
    from scale_probe import probe_label_propagation

    r = probe_label_propagation(spark, 100_000, 8)
    assert r["recovered_exactly"], r
    assert r["unlabeled"] == 0 and r["wrong_community"] == 0
    assert r["nodes"] == 10_000


def test_streaming_probe_stream_equals_batch(spark):
    from scale_probe import probe_streaming

    r = probe_streaming(spark, 50_000, 8)
    assert r["stream_equals_batch"], r
    assert r["rows_streamed"] == 50_000


def test_dedup_probe_gates_hold_at_small_size(spark):
    """Pin probe_dedup's exactness gates (planted recall 1.0 in both the
    banding stage and the winnowing postings join, closed-form distinct
    count) after the r12 reduce-width fix — the probe now repartitions
    the expansion builds before their groupBy, which must not change any
    gate, only the exchange width."""
    from scale_probe import probe_dedup

    r = probe_dedup(spark, 10_000, 4)
    assert r["exact"]["distinct_exact"], r
    assert r["minhash_banding"]["planted_recall_1"], r
    assert r["winnowing_postings"]["planted_recall_1"], r
    assert r["postings_shuffle_width"] >= 4
