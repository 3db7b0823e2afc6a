"""Deduplication operators for training-data pipelines — exact and near.

Five strategies, all shuffle-conscious:

- ``exact_dedup``: md5(content) → groupBy hash. One shuffle on a 16-byte
  key; at 100 TB this is the cheapest possible dedup (hash first, never
  shuffle the payload — only doc_id + digest move).
- ``ngram_jaccard_pairs``: exact n-gram Jaccard over candidate pairs from
  an inverted shingle index (explode → self-join on shingle). The index
  join is the scale play: O(sum of postings²) per shingle instead of O(n²)
  over the corpus; hot shingles are capped (df-style stop-shingle cut) to
  bound skew.
- ``minhash_lsh_pairs``: MinHash signatures + banded LSH. Signatures are
  built with portable md5-derived hash functions (no JVM-specific hashing)
  entirely with array expressions; bands explode to (band_id, band_hash)
  buckets → join within buckets. Tunable (b, r) for target Jaccard.
- ``simhash64``: 64-bit SimHash over token md5 bits; near-dups = equal
  16-bit bands (Hamming blocking).
- embedding-cosine near-dup lives in ``operators.similarity``
  (``cosine_neardup_pairs``): cosine ≥ τ pairs with LSH blocking.

Reference scope note: the reference's only dedup is full-row
``drop_duplicates()`` (``pandas_DataModel.py:161``) — covered by
``operators.relational.distinct_rows``. Everything here is the extension
surface mandated by BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datamodel_clinicaldata_spark.functions.text import word_shingles


def exact_dedup_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    canonical (minimum) id and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(content_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingle_index(
    df: DataFrame, content_col: str, id_col: str, k: int, max_postings: int
) -> DataFrame:
    """Inverted index: (shingle, id), hot shingles dropped.

    ``max_postings`` caps a shingle's posting list: a shingle occurring in
    more than that many docs generates quadratic candidate pairs and near
    zero signal (it's a stop-shingle) — dropping it bounds both skew and
    output size. Done with a window count, one shuffle on shingle."""
    from pyspark.sql import Window

    idx = df.select(
        F.col(id_col), F.explode(F.array_distinct(word_shingles(F.col(content_col), k))).alias("shingle")
    )
    w = Window.partitionBy("shingle")
    return (
        idx.withColumn("__df", F.count(F.lit(1)).over(w))
        .filter(F.col("__df") <= max_postings)
        .drop("__df")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_postings: int = 200,
) -> DataFrame:
    """Exact k-token-shingle Jaccard for every candidate pair sharing at
    least one (non-stop) shingle. Output: (id_a, id_b, jaccard), id_a <
    id_b, jaccard ≥ threshold.

    Jaccard is computed on distinct shingle sets via
    ``array_intersect``/``array_union`` (set semantics) after the
    inverted-index join proposes candidates — exact, so no false
    positives; false negatives only for pairs whose every shared shingle
    was stop-capped (at the default cap that implies ubiquitous shingles
    only)."""
    docs = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(content_col), k)).alias("shingles"),
    )
    idx = _shingle_index(df, content_col, id_col, k, max_postings)
    a, b = idx.alias("a"), idx.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    da = docs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(content: Column, k: int, num_hashes: int) -> Column:
    """MinHash signature as array<long>, fully with array expressions:
    one md5 per shingle, then per-hash xor-permutations of it — O(shingles
    + num_hashes) work per doc, not O(shingles × num_hashes) md5 calls."""
    base = F.transform(
        F.array_distinct(word_shingles(content, k)),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(base, lambda h: h.bitwiseXOR(F.shiftleft(i, 16) + i * 2654435761))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-dup detection.

    rows-per-band r = num_hashes/bands; candidate pairs = docs agreeing on
    all r rows of ≥1 band; each candidate is then verified with exact
    shingle Jaccard (no false positives; miss prob for j ≥ t is
    (1-t^r)^b — ~1e-7 at defaults for j=0.5).

    Scale shape: signatures are a projection (no shuffle); the explode is
    ×bands (not ×shingles); one shuffle on (band, band_hash); bucket join
    output is bounded by bucket sizes. This is the 100 TB path — the
    inverted-index exact join in ``ngram_jaccard_pairs`` is the small-corpus
    path.
    """
    r = num_hashes // bands
    docs = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(content_col), k)).alias("shingles"),
        minhash_signature(F.col(content_col), k, num_hashes).alias("sig"),
    )
    banded = docs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(F.concat_ws(",", F.slice("sig", b * r + 1, r))).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    da = docs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.greatest(
        F.size(F.array_union("sh_a", "sh_b")), F.lit(1)
    )
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(content: Column, k: int = 1) -> Column:
    """64-bit SimHash from token (or k-shingle) md5s: per bit, sum of ±1
    votes across shingle hashes; bit set when the vote is positive.
    Array-expression only — no UDF, no shuffle."""
    units = F.array_distinct(word_shingles(content, k)) if k > 1 else F.array_distinct(
        F.split(F.trim(content), r"\s+")
    )
    # one 60-bit value per unit from the md5 hex (first 15 hex chars).
    # Bit positions are unrolled statically: shiftright/shiftleft take a
    # Python int, and a 60-term sum keeps everything in one codegen'd
    # projection (vote count = 2·popcount-ish work per unit, fine for
    # document-length token sets).
    hashes = F.transform(
        units, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )
    # NB: the bit index must be bound via a closure factory, NOT a default
    # argument — pyspark's higher-order-function wrapper introspects lambda
    # arity, so `lambda acc, h, i=i` would be treated as a 3-variable
    # lambda and `i` would receive a Column.
    def vote_at(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(60):
        vote = F.aggregate(hashes, F.lit(0), vote_at(i))
        out = out + F.when(vote > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_band_pairs(
    df: DataFrame, content_col: str, id_col: str, band_bits: int = 15
) -> DataFrame:
    """SimHash near-dup blocking: docs sharing any of the 4 15-bit bands of
    their simhash (Hamming-distance blocking: distance ≤ 3 guarantees ≥1
    equal band). Output: (id_a, id_b, hamming)."""
    sh = df.select(F.col(id_col), simhash64(F.col(content_col)).alias("sh"))
    banded = sh.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sh"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sh", "bb.band", "bb.bv")
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )
