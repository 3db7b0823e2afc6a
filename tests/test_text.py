"""Unit tests for text-analysis expressions: tokenization, quality
signals, language-ID heuristic, fingerprints."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datamodel_clinicaldata_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_struct,
    token_count,
    word_shingles,
)


def _one(spark, text, expr):
    return spark.createDataFrame([Row(text=text)]).select(expr.alias("v")).first()["v"]


def test_token_count(spark):
    assert _one(spark, "  a b   c  ", token_count(F.col("text"))) == 3
    assert _one(spark, "single", token_count(F.col("text"))) == 1


def test_word_shingles(spark):
    got = _one(spark, "a b c d", word_shingles(F.col("text"), 3))
    assert got == ["a b c", "b c d"]
    # short doc: one truncated shingle, never empty
    assert _one(spark, "a b", word_shingles(F.col("text"), 3)) == ["a b"]


def test_punct_ratio(spark):
    assert _one(spark, "ab,.", punct_ratio(F.col("text"))) == pytest.approx(0.5)
    assert _one(spark, "abcd", punct_ratio(F.col("text"))) == pytest.approx(0.0)


def test_lang_id(spark):
    assert _one(spark, "the cat is on the mat", lang_id(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist", lang_id(F.col("text"))) == "de"
    assert _one(spark, "le chat et la souris est", lang_id(F.col("text"))) == "fr"
    assert _one(spark, "xyzzy plugh", lang_id(F.col("text"))) == "und"


def test_quality_struct_signals(spark):
    text = "the cat sat."  # 3 tokens, 12 chars, 1 punct
    row = (
        spark.createDataFrame([Row(text=text)])
        .select(*[c.alias(n) for n, c in quality_struct(F.col("text")).items()])
        .first()
    )
    assert row["n_chars_actual"] == 12
    assert row["n_tokens"] == 3
    assert row["punct_ratio"] == pytest.approx(1 / 12)
    assert row["stopword_ratio"] == pytest.approx(1 / 3)
    assert row["uniq_token_ratio"] == pytest.approx(1.0)


def test_doc_fingerprint_collision_behavior(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="identical document text body here"),
            Row(doc_id=2, text="identical document text body here"),
            Row(doc_id=3, text="a thoroughly different piece of writing"),
        ]
    )
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_greedy_pack_invariants(spark, sf_dir):
    """Greedy packer: bins fill in doc_id order, never exceed the budget
    (except single oversized docs), and match a driver-side replay."""
    from datamodel_clinicaldata_spark.queries_trainingdata import (
        _PACK_BUDGET,
        pack_sequences_greedy,
    )

    rows = pack_sequences_greedy(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert len(rows) > 0
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r["doc_id"])
        # replay greedy packing on the driver
        filled, cur = 0, 0
        for r in rs:
            if filled > 0 and filled + r["n_tokens"] > _PACK_BUDGET:
                cur += 1
                filled = 0
            filled += r["n_tokens"]
            assert r["bin_id"] == cur, (source, r)
        # bin totals respect the budget unless a bin is a single huge doc
        totals: dict[int, list[int]] = {}
        for r in rs:
            totals.setdefault(r["bin_id"], []).append(r["n_tokens"])
        for sizes in totals.values():
            assert sum(sizes) <= _PACK_BUDGET or len(sizes) == 1


def test_cms_never_underestimates(spark):
    """CMS point estimates are upper bounds on true counts; with a
    near-empty sketch (few distinct keys vs 4×256 counters) they are
    exact."""
    from pyspark.sql import Row

    from datamodel_clinicaldata_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    items = spark.createDataFrame(
        [Row(w=x) for x in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]]
    )
    sketch = cms_build(items, "w")
    keys = spark.createDataFrame([Row(w=x) for x in "abcd"])
    est = {r["w"]: r["cms_est"] for r in cms_estimate(sketch, keys, "w").collect()}
    truth = {"a": 5, "b": 3, "c": 2, "d": 1}
    for k, t in truth.items():
        assert est[k] >= t
    # 4 keys in 1024 counters: collision-free, so estimates are exact
    assert est == truth


def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing theorem: two documents sharing a substring of
    length ≥ k+w−1 (= 23 at k=16, w=8) MUST share at least one
    fingerprint — that is the property the scheme is chosen for."""
    from pyspark.sql import Row

    from datamodel_clinicaldata_spark.functions.text import (
        gram_hashes,
        winnow_from_hashes,
    )

    shared = "the quick brown fox jumps!"  # 26 chars ≥ 23
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="AAAA " + shared + " unrelated tail one"),
            Row(doc_id=2, text="completely other prefix " + shared + " zz"),
            Row(doc_id=3, text="no overlap here at all, different text body"),
        ]
    )
    fp = docs.withColumn("hs", gram_hashes(F.col("text"), k=16)).select(
        "doc_id", winnow_from_hashes(F.col("hs"), w=8).alias("fps")
    )
    out = {r["doc_id"]: set(r["fps"]) for r in fp.collect()}
    assert out[1] & out[2], "docs sharing a 26-char substring must share a fingerprint"
    # sanity: fingerprint sets are sorted-distinct and nonempty
    assert all(len(v) > 0 for v in out.values())


def test_winnowing_density_and_determinism(spark):
    """Fingerprint count ≈ n_grams/w (window minima dedupe), and the
    whole pipeline is deterministic across evaluations."""
    from pyspark.sql import Row

    from datamodel_clinicaldata_spark.functions.text import (
        gram_hashes,
        winnow_from_hashes,
    )

    text = "abcdefghij " * 40  # 440 chars, repetitive → heavy dedup
    doc = spark.createDataFrame([Row(doc_id=1, text=text)])
    q = doc.withColumn("hs", gram_hashes(F.col("text"), k=16)).select(
        F.size("hs").alias("n"), winnow_from_hashes(F.col("hs"), w=8).alias("fps")
    )
    r1, r2 = q.collect()[0], q.collect()[0]
    assert r1["fps"] == r2["fps"]
    assert r1["fps"] == sorted(set(r1["fps"]))
    # repetitive text: far fewer fingerprints than grams; never more
    # than the window count
    assert 0 < len(r1["fps"]) <= r1["n"] - 8 + 1


def test_winnowing_short_documents(spark):
    """Docs shorter than k still fingerprint (whole-text gram); docs
    with fewer than w grams yield exactly one fingerprint."""
    from pyspark.sql import Row

    from datamodel_clinicaldata_spark.functions.text import (
        gram_hashes,
        winnow_from_hashes,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="tiny"), Row(doc_id=2, text="exactly sixteen!!")]
    )
    fp = docs.withColumn("hs", gram_hashes(F.col("text"), k=16)).select(
        "doc_id", F.size("hs").alias("n"), winnow_from_hashes(F.col("hs"), w=8).alias("fps")
    )
    out = {r["doc_id"]: r for r in fp.collect()}
    assert out[1]["n"] == 1 and len(out[1]["fps"]) == 1
    assert out[2]["n"] == 2 and len(out[2]["fps"]) == 1  # 2 grams < w → min of all


def test_chunk_overlap_boundaries(spark, tmp_path):
    """Chunk grid edges: short docs yield one whole-text chunk; adjacent
    chunks overlap by exactly 64 chars; the tail chunk may be short but
    is never empty; coverage is complete (concatenation of stride
    prefixes + last chunk reconstructs the text)."""
    from pyspark.sql import Row

    from datamodel_clinicaldata_spark.queries_text import text_chunk_overlap

    texts = {
        1: "short doc",                 # < size → 1 chunk
        2: "x" * 512,                   # exactly one window → 1 chunk
        3: "a" * 513,                   # one past → 2 chunks (tail 65)
        4: "".join(chr(97 + i % 26) for i in range(1500)),
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v, lang="en", n_chars=len(v), source="t")
         for k, v in texts.items()]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = text_chunk_overlap(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_len"] == 9
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_len"] == 512
    assert len(by_doc[3]) == 2
    assert by_doc[3][1]["chunk_len"] == 513 - 448  # tail = 65 incl. overlap
    import hashlib
    import math

    for k, text in texts.items():
        n_expected = max(math.ceil((len(text) - 64) / 448), 1)
        assert len(by_doc[k]) == n_expected
        for i, r in by_doc[k].items():
            want = text[i * 448 : i * 448 + 512]
            assert r["chunk_len"] == len(want)
            assert r["chunk_md5"] == hashlib.md5(want.encode()).hexdigest()


def test_shingle_family_null_text_contract(spark):
    """Null text must produce NO gram stream anywhere in the shingle
    family (the ADVICE-r9 latent-divergence class: a null-text doc must
    not emit a phantom gram/fingerprint that an oracle's explode would
    drop). word_shingles already returned NULL for null text; r10 pins
    char_shingles (and everything built on it) to the same contract."""
    from pyspark.sql import functions as F

    from datamodel_clinicaldata_spark.functions.text import (
        char_shingles,
        doc_fingerprint,
        gram_hashes,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello world of spark")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        char_shingles(F.col("text"), 12).alias("cs"),
        word_shingles(F.col("text"), 3).alias("ws"),
        doc_fingerprint(F.col("text")).alias("fp"),
        gram_hashes(F.col("text")).alias("gh"),
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    # null text: every derivation is NULL — explode drops the row
    assert rows[1]["cs"] is None and rows[1]["ws"] is None
    assert rows[1]["fp"] is None and rows[1]["gh"] is None
    # real text still produces grams and a fingerprint
    assert rows[3]["cs"] and rows[3]["fp"] is not None and rows[3]["gh"]
    # exploding the null-doc's grams yields zero rows
    n = (
        df.select("doc_id", F.explode(char_shingles(F.col("text"), 12)).alias("g"))
        .filter(F.col("doc_id") == 1)
        .count()
    )
    assert n == 0
