"""Text-analysis queries over the ``documents`` table, each with an exact
DuckDB oracle twin (extension surface: language-ID, quality scoring, token
counting, document fingerprinting).

All Spark expressions are built-in functions (JVM, codegen); the oracle SQL
replays the identical arithmetic so values match bitwise (plain divisions)
or by construction (md5 digests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datamodel_clinicaldata_spark.functions.text import (
    BPE_SPLIT_PATTERN,
    LANG_MARKERS,
    STOPWORDS_EN,
    bpe_token_count,
    doc_fingerprint,
    gram_hashes,
    lang_id,
    quality_struct,
    token_count,
    tokens,
    winnow_from_hashes,
    word_shingles,
)
from datamodel_clinicaldata_spark.registry import register
from datamodel_clinicaldata_spark.operators.partitioning import ensure_min_parallelism
from datamodel_clinicaldata_spark.sources.readers import read_table

_TOKS = "string_split_regex(trim(text), '\\s+')"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _hits(words: list[str]) -> str:
    return f"len(list_filter({_TOKS}, t -> list_contains({_sql_list(words)}, t)))"


@register(
    "text_bpe_token_count",
    f"""
    SELECT doc_id,
           len({_TOKS}) AS n_ws_tokens,
           len(regexp_extract_all(text,
               '{BPE_SPLIT_PATTERN.replace("'", "''")}')) AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting next to the whitespace count — the quick
    LLM-token-cost estimate (pre-tokenizer segment count; actual BPE
    merges only split segments further). The pattern is restricted to
    constructs Java regex (Spark) and RE2 (DuckDB) evaluate identically,
    so the oracle replays the exact same split — see
    ``functions.text.BPE_SPLIT_PATTERN``. One JVM regexp pass per doc,
    embarrassingly parallel, no shuffle."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


@register(
    "text_token_stats",
    f"""
    SELECT doc_id, lang, n_chars,
           length(text) AS n_chars_actual,
           len({_TOKS}) AS n_tokens
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokenization, claimed-vs-actual chars."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.length("text").cast("long").alias("n_chars_actual"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )


@register(
    "text_quality",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_actual,
           len({_TOKS}) AS n_tokens,
           (length(text) - (len({_TOKS}) - 1)) / greatest(len({_TOKS}), 1) AS avg_token_len,
           (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{{}}-]', '', 'g')))
             / greatest(length(text), 1) AS punct_ratio,
           {_hits(STOPWORDS_EN)} / greatest(len({_TOKS}), 1) AS stopword_ratio,
           len(list_distinct({_TOKS})) / greatest(len({_TOKS}), 1) AS uniq_token_ratio
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword/uniqueness signals."""
    d = read_table(spark, sf_dir, "documents")
    qs = quality_struct(F.col("text"))
    for int_col in ("n_chars_actual", "n_tokens"):
        qs[int_col] = qs[int_col].cast("long")
    return d.select("doc_id", *[c.alias(n) for n, c in qs.items()])


@register(
    "text_lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_hits(LANG_MARKERS['en'])} AS s_en,
             {_hits(LANG_MARKERS['de'])} AS s_de,
             {_hits(LANG_MARKERS['fr'])} AS s_fr,
             {_hits(LANG_MARKERS['es'])} AS s_es
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of marker-word hit counts, first-lang
    tiebreak, 'und' when no markers hit. (The testdata's ``lang`` column is
    synthetic noise over a shared vocabulary, so ``lang_pred`` is the
    deterministic heuristic output, cross-checked engine-vs-engine.)"""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id(F.col("text")).alias("lang_pred"))


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           list_min(list_transform(range(1, greatest(length(text) - 15, 1) + 1),
                                   i -> md5(text[i : i + 15]))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-md5 over 16-char shingles (1-perm MinHash)."""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint(F.col("text"), k=16).alias("fingerprint"))


@register(
    "text_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln((SELECT n FROM n) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (raw tf × ln(N/df), deterministic
    term tiebreak). Shapes: one explode + two aggregates; the document
    frequency table is a narrow dim the planner broadcasts back onto the
    term-frequency fact. ln(N/df) is an IEEE-deterministic double on both
    engines; round(6) guards the tf multiple."""
    d = read_table(spark, sf_dir, "documents")
    from datamodel_clinicaldata_spark.functions.text import tokens
    from pyspark.sql import Window

    n = d.count()
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n)) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


def _cms_rows_sql() -> str:
    """VALUES rows of the exact (hash_row, multiplier, addend) constants
    the Spark sketch uses (``operators.sketches.CMS_ROWS``)."""
    from datamodel_clinicaldata_spark.operators.sketches import CMS_ROWS

    return ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(CMS_ROWS))


@register(
    "text_cms_heavy_hitters",
    f"""
    WITH tok AS (
      SELECT unnest({_TOKS}) AS token FROM documents
    ), th AS (
      SELECT token,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(token, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS h
      FROM tok
    ), hr(j, mult, add) AS (VALUES {_cms_rows_sql()}),
    sk AS (
      SELECT hr.j, ((th.h * hr.mult + hr.add) % 1000000007) % 256 AS bucket,
             CAST(count(*) AS BIGINT) AS counter
      FROM th CROSS JOIN hr
      GROUP BY 1, 2
    ), exact AS (
      SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt FROM tok GROUP BY 1
    ), top AS (
      SELECT token, exact_cnt, rank FROM (
        SELECT token, exact_cnt,
               CAST(row_number() OVER (ORDER BY exact_cnt DESC, token ASC)
                    AS BIGINT) AS rank
        FROM exact) WHERE rank <= 20
    ), est AS (
      SELECT u.token, min(s.counter) AS cms_est
      FROM (SELECT DISTINCT token, h FROM th) u
      JOIN top USING (token)
      CROSS JOIN hr
      JOIN sk s ON s.j = hr.j
              AND s.bucket = ((u.h * hr.mult + hr.add) % 1000000007) % 256
      GROUP BY 1
    )
    SELECT top.token, top.exact_cnt, est.cms_est,
           est.cms_est - top.exact_cnt AS overest, top.rank
    FROM top JOIN est USING (token)
    """,
)
def text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency estimation with a count-min sketch built from groupBy
    primitives (``operators.sketches``): the corpus token stream folds
    into d=4 × w=256 integer counters (shuffle bounded by d·w at ANY
    corpus size), then the exact top-20 tokens are point-queried against
    the sketch — ``overest ≥ 0`` by the CMS guarantee, and the whole
    cascade is integer math on a portable rolling hash, so the oracle
    replays it exactly. The exact counts are oracle scaffolding; at
    100 TB only the kilobyte sketch would be kept. The exact top-20 is
    ``ranking.topk_ranked`` over the post-agg vocabulary — distributed
    TakeOrdered, not a single-partition vocabulary sort (advice r5)."""
    from datamodel_clinicaldata_spark.operators.ranking import topk_ranked
    from datamodel_clinicaldata_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    sketch = cms_build(tok, "token", depth=4, width=256)
    exact = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    top = topk_ranked(
        exact, [F.col("exact_cnt").desc(), F.col("token").asc()], 20
    )
    est = cms_estimate(sketch, top.select("token"), "token", depth=4, width=256)
    return top.join(est, "token").select(
        "token",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overest"),
        "rank",
    )


@register(
    "text_bm25_rank",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY 1
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len) AS BIGINT) AS total_len
      FROM dl
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
      WHERE term IN ('spark', 'table', 'join') GROUP BY 1, 2
    ), df AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks
      WHERE term IN ('spark', 'table', 'join') GROUP BY 1
    ), contrib AS (
      SELECT tf.doc_id, tf.term,
             ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 *
                    (dl.len / (CAST(stats.total_len AS DOUBLE) / stats.n))))
               AS c
      FROM tf
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ), scored AS (
      SELECT doc_id,
             floor((coalesce(max(CASE WHEN term = 'spark' THEN c END), 0.0)
                    + coalesce(max(CASE WHEN term = 'table' THEN c END), 0.0)
                    + coalesce(max(CASE WHEN term = 'join' THEN c END), 0.0))
                   * 1000000.0 + 0.5) / 1000000.0 AS bm25
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, bm25, rank FROM (
      SELECT doc_id, bm25,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
               AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking (Robertson-Sparck Jones, k1=1.2, b=0.75) of the corpus
    for a 3-term query — the classic IR relevance score over tf, df and
    length normalization. Determinism care: the per-term contributions
    are summed in FIXED expression order (conditional-max pivot, not a
    float SUM whose partial-agg order varies), and the score is
    fixed-point-rounded before it becomes a rank key. Plan: token stream
    filtered to the query terms BEFORE any shuffle; df (3 rows) and the
    corpus stats scalar broadcast; the final top-10 ranks |matching docs|
    rows."""
    from datamodel_clinicaldata_spark.functions.vectors import round_fixed

    terms = ["spark", "table", "join"]
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("len").cast("long").alias("total_len"),
    )
    qtoks = toks.filter(F.col("term").isin(terms))
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = qtoks.groupBy("term").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                F.log(
                    (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2
                    * (
                        1.0
                        - 0.75
                        + 0.75
                        * (
                            F.col("len")
                            / (
                                F.col("total_len").cast("double") / F.col("n")
                            )
                        )
                    )
                )
            ).alias("c"),
        )
    )
    pick = lambda t: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("term") == t, F.col("c"))), F.lit(0.0)
    )
    scored = contrib.groupBy("doc_id").agg(
        round_fixed(pick("spark") + pick("table") + pick("join"), 6).alias("bm25")
    )
    from datamodel_clinicaldata_spark.operators.ranking import topk_ranked

    return topk_ranked(scored, [F.col("bm25").desc(), F.col("doc_id").asc()], 10)


@register(
    "text_pmi_cooccurrence",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), nn AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM toks
    ), df AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS d FROM toks GROUP BY 1
    ), pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(count(*) AS BIGINT) AS nab
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
    ), scored AS (
      SELECT tok_a, tok_b, nab, da.d AS na, db.d AS nb,
             floor(ln(CAST(nab * nn.n AS DOUBLE) / (da.d * db.d))
                   * 1000000.0 + 0.5) / 1000000.0 AS pmi
      FROM pairs
      JOIN df da ON da.tok = tok_a
      JOIN df db ON db.tok = tok_b
      CROSS JOIN nn
      WHERE nab >= 5
    )
    SELECT tok_a, tok_b, nab, na, nb, pmi, rank FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, tok_a ASC, tok_b ASC)
                     AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 20
    """,
)
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top document-level token pairs by pointwise
    mutual information, PMI = ln(P(a,b)/(P(a)P(b))) over exact presence
    counts — the classic phrase/association miner. The numerator and
    denominator are exact integer products before ONE double division, so
    both engines feed ln the identical double (same doctrine as BM25's
    fixed-order scoring). Pair counts come from the doc-grouped self-join
    of the distinct presence list; at 100 TB that join is bounded per doc
    by vocabulary-per-doc², and the df/N sides broadcast."""
    from datamodel_clinicaldata_spark.functions.vectors import round_fixed

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).distinct()
    # r13 pin (assignment-table doctrine): `toks` — a full explode +
    # DISTINCT shuffle of the token stream — feeds FOUR consumers (nn,
    # the two differently-keyed df broadcasts, both self-join sides);
    # the broadcast keys differ, so exchange reuse cannot cover them and
    # the plan recomputed the distinct ~4×. One lazy pin computes it
    # once; results bit-identical (pure materialization).
    from datamodel_clinicaldata_spark.operators.graph import truncate_lineage

    toks = truncate_lineage(toks, eager=False)
    nn = toks.agg(F.count_distinct("doc_id").cast("long").alias("n"))
    df_ = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a = toks.select(F.col("doc_id"), F.col("tok").alias("tok_a"))
    b = toks.select(F.col("doc_id").alias("__db"), F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, (F.col("doc_id") == F.col("__db")) & (F.col("tok_a") < F.col("tok_b")))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("nab"))
        .filter(F.col("nab") >= 5)
    )
    scored = (
        pairs.join(
            F.broadcast(df_.select(F.col("tok").alias("tok_a"), F.col("d").alias("na"))),
            "tok_a",
        )
        .join(
            F.broadcast(df_.select(F.col("tok").alias("tok_b"), F.col("d").alias("nb"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "tok_a",
            "tok_b",
            "nab",
            "na",
            "nb",
            round_fixed(
                F.log(
                    (F.col("nab") * F.col("n")).cast("double")
                    / (F.col("na") * F.col("nb"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    from datamodel_clinicaldata_spark.operators.ranking import topk_ranked

    return topk_ranked(
        scored,
        [F.col("pmi").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()],
        20,
    )


@register(
    "text_unigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS total FROM freq
    )
    SELECT toks.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(-sum(ln(CAST(freq.c AS DOUBLE) / tot.total)) / count(*), 4)
             AS avg_neg_logprob
    FROM toks JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY toks.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: per document, the mean negative
    log-probability of its tokens under the corpus unigram distribution —
    the cheap stand-in for the perplexity filtering of CCNet/CC-Net-style
    curation (Wenzek et al. 2020): gibberish and boilerplate score high,
    typical text low. Frequencies are exact integers; each token's
    ln(c/total) is one double division fed to ln, and the per-doc float
    sum rounds to 4 (same absorb-the-ulp doctrine as the stddev rows).
    Plan: token explode → broadcast-joinable freq table → one per-doc agg."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = freq.agg(F.sum("c").cast("long").alias("total"))
    j = toks.join(F.broadcast(freq), "tok").crossJoin(F.broadcast(tot))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(
            -F.sum(F.log(F.col("c").cast("double") / F.col("total")))
            / F.count(F.lit(1)),
            4,
        ).alias("avg_neg_logprob"),
    )


@register(
    "text_source_kl_divergence",
    f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS}) AS tok FROM documents
    ), sc AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
    ), st AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS s_total FROM sc GROUP BY 1
    ), gc AS (
      SELECT tok, CAST(sum(c) AS BIGINT) AS g FROM sc GROUP BY 1
    ), gt AS (
      SELECT CAST(sum(g) AS BIGINT) AS g_total FROM gc
    )
    SELECT sc.source,
           CAST(max(st.s_total) AS BIGINT) AS n_tokens,
           round(CAST(sum(CAST(floor((CAST(sc.c AS DOUBLE) / st.s_total)
                     * ln((CAST(sc.c AS DOUBLE) / st.s_total)
                          / (CAST(gc.g AS DOUBLE) / gt.g_total))
                     * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000000000.0, 4) AS kl_vs_corpus
    FROM sc
    JOIN st USING (source)
    JOIN gc USING (tok)
    CROSS JOIN gt
    GROUP BY sc.source
    """,
)
def text_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift audit: KL(source token distribution ‖ corpus
    distribution) per source — the standard check that one slice of a
    mixture has drifted from the whole (a spiking KL flags a source whose
    content changed or was contaminated). Every probability is one double
    division of exact integer counts, so each per-token KL TERM is the
    identical double in both engines; the per-source sum quantizes each
    term to a 10⁻¹² fixed-point BIGINT before adding (advice r5 #4: a
    float sum over a vocab-sized term set is combine-order-dependent and
    this sum IS the reported statistic). Exact integer addition, one
    cast+division at output, rounded to 4 — quantization perturbs the
    true KL by ≤ |vocab|·5e-13, far under the reported precision at any
    plausible per-source vocabulary. Overflow-safe at ANY corpus size:
    Σp = 1 bounds Σ|p·ln(p/q)| by max|ln(p/q)| ≈ ln(g_total) ≲ 50, so
    the quantized sum stays ≤ ~5e13 ≪ BIGINT range. Plan: two bounded
    aggregations (per-source-token, per-token) then a broadcast-joined
    scoring pass — nothing shuffles more than the (source × vocab) count
    table."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    sc = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    st = sc.groupBy("source").agg(F.sum("c").cast("long").alias("s_total"))
    gc = sc.groupBy("tok").agg(F.sum("c").cast("long").alias("g"))
    gt = gc.agg(F.sum("g").cast("long").alias("g_total"))
    p = F.col("c").cast("double") / F.col("s_total")
    q = F.col("g").cast("double") / F.col("g_total")
    j = (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(gc), "tok")
        .crossJoin(F.broadcast(gt))
    )
    term_q = F.floor(p * F.log(p / q) * 1e12 + F.lit(0.5)).cast("long")
    return j.groupBy("source").agg(
        F.max("s_total").cast("long").alias("n_tokens"),
        F.round(F.sum(term_q).cast("double") / 1e12, 4).alias("kl_vs_corpus"),
    )


@register(
    "text_zipf_fit",
    f"""
    WITH toks AS (
      SELECT unnest({_TOKS}) AS tok FROM documents
    ), freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS r FROM freq
    )
    SELECT CAST(count(*) AS BIGINT) AS vocab_size,
           round(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
             AS zipf_slope,
           round(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
             AS fit_r2
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law diagnostic: the log-log rank-frequency slope of the corpus
    vocabulary (natural text ≈ −1; a flat slope near 0 means a synthetic
    or templated vocabulary). This is the statistic that PREDICTS whether
    frequency-ordered blocking (prefix filtering, stop-shingle caps) will
    pay: those strategies feed on the Zipf head/tail split, and SCALING.md
    records the measured consequence of this corpus's flat slope. One
    bounded vocab aggregation; regression moments round to 4 (float-sum
    ulp doctrine). The full vocabulary rank is the two-phase distributed
    ``ranking.ordered_prefix`` — range-partitioned local ranks plus
    broadcast offsets, never a single-partition vocabulary sort."""
    from datamodel_clinicaldata_spark.operators.ranking import ordered_prefix

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ranked = ordered_prefix(
        freq, [F.col("c").desc(), F.col("tok").asc()], rank_col="r"
    ).select("c", "r")
    lc = F.log(F.col("c").cast("double"))
    lr = F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.round(F.regr_slope(lc, lr), 4).alias("zipf_slope"),
        F.round(F.regr_r2(lc, lr), 4).alias("fit_r2"),
    )


@register(
    "text_ctfidf_source_terms",
    f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
    ), af AS (
      SELECT term, CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY 1
    ), ns AS (
      SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources FROM tf
    ), scored AS (
      SELECT tf.source, tf.term,
             floor(tf.tf * ln(1.0 + (CAST(af.total_tf AS DOUBLE) / ns.n_sources)
                                    / tf.tf)
                   * 1000000.0 + 0.5) / 1000000.0 AS ctfidf
      FROM tf JOIN af USING (term) CROSS JOIN ns
    )
    SELECT source, term, ctfidf, rank FROM (
      SELECT source, term, ctfidf,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY ctfidf DESC, term ASC) AS BIGINT)
               AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def text_ctfidf_source_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-TF-IDF (the BERTopic/c-TF-IDF formulation): terms that
    characterize each SOURCE rather than each document — tf within the
    class weighted by ln(1 + avg-class-frequency / class-tf), the
    contrast score topic labelers use. Exact integer counts into one
    fixed-shape double expression per row; rank keys fixed-point rounded
    with term tie-breaks. Everything aggregates to |sources|×|vocab|
    before any window."""
    from pyspark.sql import Window

    from datamodel_clinicaldata_spark.functions.vectors import round_fixed

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    tf = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    af = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("total_tf"))
    ns = tf.select(F.count_distinct("source").cast("long").alias("n_sources"))
    scored = (
        tf.join(F.broadcast(af), "term")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "term",
            round_fixed(
                F.col("tf")
                * F.log(
                    1.0
                    + (F.col("total_tf").cast("double") / F.col("n_sources"))
                    / F.col("tf")
                ),
                6,
            ).alias("ctfidf"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("ctfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
    )


@register(
    "feature_hashing_trick",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), th AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(tok, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS h
      FROM toks
    ), bucketed AS (
      SELECT doc_id, ((h * 2654435761 + 2246822519) % 1000000007) % 1024 AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM th GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS nnz,
           CAST(sum(c * c) AS BIGINT) AS sq_norm,
           CAST(max_by(bucket, c * 10000 - bucket) AS BIGINT) AS top_bucket
    FROM bucketed GROUP BY doc_id
    """,
)
def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML'09): tokens hash into a
    fixed 1024-dim count vector per document — constant-width features
    with no vocabulary pass, the featurizer linear models train on at
    scale. Reuses the CMS rolling hash + affine mixing so buckets are
    bit-identical across engines; the row emits the vector's summary
    (nnz, squared L2 norm, argmax bucket) because the driver gate hashes
    scalars, not arrays; argmax ties encode into the composite BIGINT
    ``c·10⁴ − bucket`` (max count, then min bucket — the same contract
    as the per-nation argmax row, since neither engine's max_by takes a
    composite key)."""
    from datamodel_clinicaldata_spark.operators.sketches import (
        cms_bucket,
        rolling_hash,
    )

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    th = toks.select("doc_id", rolling_hash(F.col("tok")).alias("h"))
    bucketed = th.select(
        "doc_id", cms_bucket(F.col("h"), 0, 1024).alias("bucket")
    ).groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return bucketed.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nnz"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq_norm"),
        F.max_by("bucket", F.col("c") * 10_000 - F.col("bucket"))
        .cast("long")
        .alias("top_bucket"),
    )


_WINNOW_FPS_SQL = """
  WITH f AS (
    SELECT doc_id,
           list_transform(range(1, greatest(length(text) - 15, 1) + 1),
             i -> CAST('0x' || substr(md5(text[i : i + 15]), 1, 15) AS BIGINT)
                  % 1000000007) AS hs
    FROM documents
  ), sel AS (
    SELECT doc_id, hs,
           list_sort(list_distinct(
             list_transform(range(1, greatest(len(hs) - 7, 1) + 1),
               j -> list_min(hs[j : j + 7])))) AS fps
    FROM f
  )
"""


@register(
    "text_winnowing_fingerprint",
    _WINNOW_FPS_SQL
    + """
    SELECT doc_id,
           CAST(len(hs) AS BIGINT) AS n_kgrams,
           CAST(len(fps) AS BIGINT) AS n_fp,
           CAST(fps[1] AS BIGINT) AS fp_min,
           CAST(coalesce(list_sum(fps), 0) AS BIGINT) AS fp_sum
    FROM sel
    """,
)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm; see
    ``functions.text.winnow_fingerprints``): per document, the distinct
    window-minimum hashes of its 16-gram stream with window 8 — the
    robust fingerprinting scheme whose guarantee (any shared substring
    of length ≥ k+w−1 = 23 shares a fingerprint) the plain min-hash
    ``text_fingerprint`` row lacks. Entirely built-in HOFs over a
    single scan: no shuffle, no UDF, fingerprint sums bounded in BIGINT
    by the 1e9+7 modulus. Oracle replays gram slicing, the md5-prefix
    hash and the window minima verbatim."""
    # compute-dense spread: ~2k md5 per doc dwarfs the scan bytes, so
    # parallelize by docs, not file splits (see ensure_min_parallelism)
    d = ensure_min_parallelism(read_table(spark, sf_dir, "documents"), "doc_id")
    # hoist the hash stream, then the fingerprint array, each exactly
    # once per row (winnow_from_hashes docstring: inlining the stream
    # into the window lambda is an O(n²)-md5 trap)
    hashed = d.withColumn("__hs", gram_hashes(F.col("text"), k=16))
    fp = hashed.withColumn("__fps", winnow_from_hashes(F.col("__hs"), w=8))
    return fp.select(
        "doc_id",
        F.size("__hs").cast("long").alias("n_kgrams"),
        F.size("__fps").cast("long").alias("n_fp"),
        F.element_at("__fps", 1).cast("long").alias("fp_min"),
        F.coalesce(
            F.aggregate(F.col("__fps"), F.lit(0).cast("long"), lambda a, x: a + x),
            F.lit(0),
        )
        .cast("long")
        .alias("fp_sum"),
    )


@register(
    "dedup_winnowing_pairs",
    _WINNOW_FPS_SQL
    + """
    , post AS (
      SELECT doc_id, unnest(fps) AS fp FROM sel
    ), ok AS (
      SELECT fp FROM post GROUP BY fp HAVING count(*) <= 5000
    ), p2 AS (
      SELECT post.doc_id, post.fp FROM post JOIN ok USING (fp)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM p2 a JOIN p2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by SHARED WINNOWING FINGERPRINTS — the
    plagiarism-detection shape: documents sharing ≥ 3 window-minimum
    hashes almost surely share ≥ k+w−1 = 23 characters of verbatim
    text per shared fingerprint. Thin face over
    ``operators.dedup.winnowing_pairs`` (promoted to the operator layer
    in r13 so the postings reduce-width doctrine — the r12 4M-doc GC
    wall — lives in the ENGINE, not the probe); plan at sf0.1 is
    unchanged (the widened exchange only appears past ~800k docs)."""
    from datamodel_clinicaldata_spark.operators.dedup import winnowing_pairs

    return winnowing_pairs(
        read_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        k=16,
        w=8,
        max_postings=5000,
        min_shared=3,
    )


@register(
    "text_bigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, tok, i FROM (
        SELECT doc_id, unnest({_TOKS}) AS tok,
               generate_subscripts({_TOKS}, 1) AS i
        FROM documents
      )
    ), bi AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
    ), bc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY 1, 2
    ), uc AS (
      SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM bc GROUP BY 1
    )
    SELECT bi.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CAST(floor(-ln(CAST(bc.c2 AS DOUBLE) / uc.c1)
                               * 1000000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS neg_logprob_e9
    FROM bi JOIN bc USING (w1, w2) JOIN uc USING (w1)
    GROUP BY bi.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional language-model scoring — the context-aware
    step past ``text_unigram_logprob`` toward CCNet-style perplexity
    filtering: per document, the total −ln P(w_i | w_{i−1}) of its
    bigrams under the corpus MLE bigram model (every document's bigrams
    are in the corpus counts by construction, so no zero-probability
    smoothing is needed). Engine-exact by the KL-divergence doctrine:
    each transcendental term quantizes to an e9 BIGINT BEFORE the
    per-doc sum, so accumulation order cannot move the result (a float
    sum of ~100 ln terms is order-sensitive; an integer sum is not).
    Plan: one posexplode → self-join on adjacent positions (equi-join
    on (doc, pos), no window) → bigram/context count dims joined WITHOUT
    a broadcast hint (ADVICE r7): the bigram table's cardinality is the
    corpus's distinct-bigram count, which at the 100 TB shape is not
    driver-broadcastable — AQE picks broadcast when the dim is actually
    small and a shuffle hash join on (w1, w2) otherwise — → one per-doc
    aggregate."""
    d = read_table(spark, sf_dir, "documents")
    # r13: adjacent bigrams are an ARRAY property, not a join — zip_with
    # over the token array (offset slices) emits each doc's (w_i, w_{i+1})
    # pairs in one projection, where the old positional self-join paid
    # two (doc, pos)-keyed exchanges for rows that sat adjacent in the
    # same array all along (guide §2.4). Identical bigram multiset.
    tok_arr = F.split(F.trim(F.col("text")), r"\s+")
    npairs = F.greatest(F.size(tok_arr) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(tok_arr, 1, npairs),
        F.slice(tok_arr, 2, npairs),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bi = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    # Pin: `bi` feeds the bigram-count dim AND the scoring join; `bc`
    # feeds the context rollup AND the join — unpinned, each consumer
    # re-ran the explode / the count aggregate (same multi-consumer
    # doctrine as the lsh_prod and pmi pins).
    from datamodel_clinicaldata_spark.operators.graph import truncate_lineage

    bi = truncate_lineage(bi, eager=False)
    bc = truncate_lineage(
        bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2")),
        eager=False,
    )
    uc = bc.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    term = F.floor(
        -F.log(F.col("c2").cast("double") / F.col("c1")) * 1_000_000_000
        + F.lit(0.5)
    ).cast("long")
    j = bi.join(bc, ["w1", "w2"]).join(uc, "w1")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(term).cast("long").alias("neg_logprob_e9"),
    )


@register(
    "text_chunk_overlap",
    """
    WITH p AS (
      SELECT doc_id, text, length(text) AS n,
             greatest(CAST(ceil((length(text) - 64) / 448.0) AS BIGINT), 1)
               AS n_chunks
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(length(text[i * 448 + 1 : i * 448 + 512]) AS BIGINT)
             AS chunk_len,
           md5(text[i * 448 + 1 : i * 448 + 512]) AS chunk_md5
    FROM p, unnest(range(0, n_chunks)) AS t(i)
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap — the standard document →
    training-sample/RAG-passage splitter: 512-char chunks advancing by
    448 (64-char overlap so no sentence is lost on a boundary). Chunk
    count is ``max(ceil((len − overlap)/stride), 1)`` — every document
    yields ≥ 1 chunk and the last chunk is the (possibly short) tail.
    Entirely built-in HOFs (sequence → explode → substring): one scan,
    no shuffle, cardinality = Σ n_chunks; chunk content is pinned
    cross-engine by its md5. The chunk grid is 1-based-inclusive
    identical on both engines (``substr(text, i·448+1, 512)`` ↔
    ``text[i·448+1 : i·448+512]``)."""
    d = read_table(spark, sf_dir, "documents")
    size, stride, overlap = 512, 448, 64
    n_chunks = F.greatest(
        F.ceil((F.length("text") - overlap) / F.lit(float(stride))).cast("long"),
        F.lit(1),
    )
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    chunked = d.select("doc_id", "text", idx)
    chunk = F.col("text").substr(
        (F.col("chunk_idx") * stride + 1).cast("int"), F.lit(size)
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


@register(
    "text_bpe_merge_pairs",
    f"""
    WITH words AS (
      SELECT unnest({_TOKS}) AS w FROM documents
    ), wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM words WHERE length(w) >= 2 GROUP BY 1
    ), pairs AS (
      SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, cnt
      FROM wc, unnest(range(1, length(w))) AS t(i)
    ), tot AS (
      SELECT pair, CAST(sum(cnt) AS BIGINT) AS n FROM pairs GROUP BY 1
    )
    SELECT pair, n,
           CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS BIGINT)
             AS rank
    FROM tot ORDER BY rank LIMIT 20
    """,
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge step's statistics — corpus-wide adjacent
    symbol-pair counts at the character stage (Sennrich et al.'s
    tokenizer induction): the top-20 most frequent pairs are exactly the
    candidates the first merge would pick. The classic
    vocabulary-induction shape: word frequencies FIRST (|vocab| rows,
    map-side combined), then pairs explode off the distinct-word table —
    pair multiplicity within a word times word count, never a re-scan of
    the corpus per pair. Global top-k via ``topk_ranked`` (TakeOrdered,
    no single-partition sort); count-desc with pair-asc tie-break makes
    the rank reproducible. All counts BIGINT; no floats anywhere."""
    from datamodel_clinicaldata_spark.operators.ranking import topk_ranked

    d = read_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    wc = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pairs = wc.select(
        "cnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    tot = pairs.groupBy("pair").agg(F.sum("cnt").cast("long").alias("n"))
    return topk_ranked(
        tot, [F.col("n").desc(), F.col("pair").asc()], k=20
    ).select("pair", "n", F.col("rank"))


@register(
    "curation_filter_funnel",
    """
    WITH f AS (
      SELECT n_chars, lang, text,
             length(string_split(text, ' ')) AS n,
             length(list_distinct(string_split(text, ' '))) AS k
      FROM documents
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500
                            AND lang = 'en'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500
                            AND lang = 'en' AND 2 * k > n
                           THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(count(DISTINCT CASE WHEN n_chars BETWEEN 100 AND 500
                                       AND lang = 'en' AND 2 * k > n
                                      THEN md5(substr(text, 1, 16))
                                 END) AS BIGINT) AS c4
      FROM f
    )
    SELECT CAST(s.i AS INTEGER) AS stage_idx, s.stage,
           CASE s.i WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2
                    WHEN 3 THEN c3 ELSE c4 END AS n_surviving
    FROM a, (VALUES (0, 'total'), (1, 'length_100_500'), (2, 'lang_en'),
                    (3, 'unique_token_ratio'), (4, 'exact_dedup_prefix16'))
             s(i, stage)
    """,
)
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation funnel — the per-stage survivor report
    every corpus pipeline publishes (C4 §2 / Gopher A.1 style): length
    gate → language gate → repetition gate (unique-token ratio, the
    Gopher "fraction of unique words" filter) → exact dedup on a
    16-char-prefix key, each stage counted CUMULATIVELY so the funnel
    reads as documents-surviving-so-far.

    Single-pass shape: all four stage predicates are per-row
    expressions computed in ONE scan (the repetition ratio uses
    ``array_distinct`` — a per-row HOF, no token explode and no
    shuffle), folded by one map-side-combined aggregate; the dedup
    stage rides the same aggregate as a conditional count-distinct
    (Spark plans it as a single expand, still one pass over the data).
    The 1-row wide result unpivots to the tall funnel via ``stack``.
    Thresholds bisect this corpus at every SF (sf0.01:
    500→426→186→80→78) so every gate is exercised — integer
    cross-multiply ``2·k > n`` keeps the ratio predicate exact.

    Scale shape: one scan of the corpus, shuffle traffic = partial-agg
    rows only (the count-distinct expand shuffles 16-byte digests for
    funnel survivors, the exact-dedup shuffle shape). At 100 TB this is
    the cheapest possible funnel: no per-stage rescan, no join."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    k = F.size(F.array_distinct(toks))
    len_ok = F.col("n_chars").between(100, 500)
    lang_ok = len_ok & (F.col("lang") == "en")
    rep_ok = lang_ok & ((2 * k) > n)
    key = F.md5(F.substring("text", 1, 16))
    wide = d.agg(
        F.count(F.lit(1)).cast("long").alias("c0"),
        F.sum(len_ok.cast("long")).cast("long").alias("c1"),
        F.sum(lang_ok.cast("long")).cast("long").alias("c2"),
        F.sum(rep_ok.cast("long")).cast("long").alias("c3"),
        F.count_distinct(F.when(rep_ok, key)).cast("long").alias("c4"),
    )
    return wide.select(
        F.expr(
            "stack(5, 0, 'total', c0, 1, 'length_100_500', c1,"
            " 2, 'lang_en', c2, 3, 'unique_token_ratio', c3,"
            " 4, 'exact_dedup_prefix16', c4)"
            " AS (stage_idx, stage, n_surviving)"
        )
    ).select(
        F.col("stage_idx").cast("int").alias("stage_idx"),
        "stage",
        F.col("n_surviving").cast("long").alias("n_surviving"),
    )


@register(
    "text_syllable_complexity",
    """
    WITH f AS (
      SELECT doc_id,
             CAST(length(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(
                    string_split(text, ' '),
                    w -> length(string_split_regex(lower(w), '[aeiouy]+')) - 1
                  )) AS BIGINT) AS n_syll,
             CAST(length(list_filter(
                    string_split(text, ' '),
                    w -> length(string_split_regex(lower(w), '[aeiouy]+')) - 1
                         >= 3
                  )) AS BIGINT) AS n_complex
      FROM documents
    )
    SELECT doc_id, n_words, n_syll, n_complex,
           (n_syll * 1000000) // n_words AS syll_per_word_e6,
           (n_complex * 1000000) // n_words AS complex_share_e6
    FROM f
    """,
)
def text_syllable_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical-complexity features — the syllable-density
    ingredients of Flesch/FOG readability scoring (syllables-per-word
    and share of 3+-syllable "complex" words), standard inputs to
    corpus quality classifiers. Syllables are approximated by vowel
    GROUPS (maximal ``[aeiouy]+`` runs), the classic cheap proxy; the
    sentence-count term of the full Flesch formula is omitted because
    this corpus carries no sentence punctuation (probed: zero ``[.!?]``
    across all SFs) — a constant-1 fallback would be an unexercised
    gate, which the query-design rule forbids.

    Engine-exactness: both ratios are integral quotients of exact
    BIGINT counts ((n·10⁶) div words — Spark ``div`` and DuckDB ``//``
    share truncation semantics), no floats anywhere. The per-word
    syllable fold runs entirely in per-row HOFs
    (transform → aggregate / list_transform → list_sum): one scan, ZERO
    shuffle, no explode — at 100 TB this is a map-only pass whose cost
    is the regex, embarrassingly parallel."""
    d = ensure_min_parallelism(read_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.col("text"), " ")

    def vg(w):
        return F.size(F.split(F.lower(w), "[aeiouy]+")) - 1

    f = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, w: acc + vg(w).cast("long"),
        ).alias("n_syll"),
        F.size(F.filter(toks, lambda w: vg(w) >= 3))
        .cast("long")
        .alias("n_complex"),
    )
    return f.select(
        "doc_id",
        "n_words",
        "n_syll",
        "n_complex",
        F.expr("(n_syll * 1000000) div n_words").alias("syll_per_word_e6"),
        F.expr("(n_complex * 1000000) div n_words").alias("complex_share_e6"),
    )


@register(
    "text_shingle_novelty",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             md5(list_aggregate(toks[i:i+4], 'string_agg', ' ')) AS h
      FROM t, unnest(range(1, length(toks) - 3)) r(i)
    ),
    df AS (
      SELECT h, CAST(count(*) AS BIGINT) AS ndocs FROM sh GROUP BY h
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           (CAST(sum(CASE WHEN df.ndocs < 2 THEN 1 ELSE 0 END) AS BIGINT)
            * 1000000) // CAST(count(*) AS BIGINT) AS novelty_e6
    FROM sh JOIN df USING (h)
    GROUP BY sh.doc_id
    """,
)
def text_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the memorization/boilerplate risk
    profile (Lee et al. 2022 "Deduplicating Training Data" §4 measure
    it this way): what share of a document's distinct 5-token shingles
    appears in at least one OTHER document? Low novelty ⇒ the document
    is mostly corpus-repeated n-grams (template/boilerplate or a
    near-dup survivor); the profile feeds both curation thresholds and
    train/eval contamination review. Width 5 was probed to bisect this
    corpus at every SF (shared-shingle fraction 4–5% at sf0.001/0.1).

    Plan shape: per-row HOFs build each document's DISTINCT shingle-
    hash array (``array_distinct`` before the explode — the per-doc
    dedup costs no shuffle), one groupBy over 16-byte digests computes
    corpus df, and the df frame joins back as per-row ENRICHMENT on the
    digest key — no pair generation anywhere, so unlike the pairwise
    dedup family this stays LINEAR in corpus size: two digest shuffles
    + one equi-join, no quadratic term, no hot-key pair blowup (a
    corpus-wide boilerplate shingle raises one df count, not O(df²)
    pairs). Novelty is an integral quotient of exact counts (shared
    ``div``/``//`` truncation semantics), no floats. Documents shorter
    than the shingle width emit nothing on both engines (Spark's
    descending-``sequence`` trap is guarded explicitly)."""
    d = ensure_min_parallelism(read_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(toks) >= 5,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 4),
                lambda i: F.md5(F.array_join(F.slice(toks, i, 5), " ")),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", F.explode(grams).alias("h"))
    # df as a count-over-partition window instead of groupBy + join-back:
    # the join shape scans+explodes documents TWICE (once per branch) and
    # shuffles the postings a second time for the join probe; the window
    # shuffles the postings ONCE on h and counts in place. Skew profile
    # is identical — a hot boilerplate shingle lands its df postings in
    # one task under either shape — but the window does strictly less
    # work (bench: 3.9 s → see SCALING.md round-8 notes).
    j = sh.withColumn(
        "ndocs", F.count(F.lit(1)).over(Window.partitionBy("h")).cast("long")
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("ndocs") >= 2).cast("long"))
            .cast("long")
            .alias("n_shared"),
            F.sum((F.col("ndocs") < 2).cast("long"))
            .cast("long")
            .alias("__novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.expr("(__novel * 1000000) div n_shingles").alias("novelty_e6"),
        )
    )


@register(
    "text_rake_keywords",
    r"""
    WITH pocc AS (
      SELECT doc_id, p AS phrase
      FROM (
        SELECT doc_id,
               unnest(list_filter(
                 list_transform(
                   string_split_regex(text, '\b(?:a|the)\b'),
                   x -> trim(x)
                 ),
                 x -> x <> ''
               )) AS p
        FROM documents
      )
    ),
    pw AS (
      SELECT phrase,
             unnest(string_split(phrase, ' ')) AS word,
             CAST(length(string_split(phrase, ' ')) AS BIGINT) AS plen
      FROM pocc
    ),
    ws AS (
      SELECT word,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS deg
      FROM pw GROUP BY word
    ),
    pd AS (
      SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM pocc GROUP BY phrase
    ),
    pwd AS (
      SELECT pd.phrase, pd.n_occurrences,
             unnest(string_split(pd.phrase, ' ')) AS word
      FROM pd
    ),
    scored AS (
      SELECT pwd.phrase, pwd.n_occurrences,
             CAST(sum((ws.deg * 1000000) // ws.freq) AS BIGINT)
               AS score_e6
      FROM pwd JOIN ws USING (word)
      GROUP BY pwd.phrase, pwd.n_occurrences
    )
    SELECT phrase, n_occurrences, score_e6,
           CAST(row_number() OVER (ORDER BY score_e6 DESC, phrase)
                AS BIGINT) AS rank
    FROM scored ORDER BY score_e6 DESC, phrase LIMIT 20
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-delimited token runs; each word scores
    degree/frequency (degree = Σ lengths of phrases it occurs in,
    frequency = its occurrence count — co-occurring in long phrases
    raises a word's score); a phrase scores the sum of its member-word
    scores; top-20 phrases corpus-wide. The stopword set is the
    corpus's own function words ({'a', 'the'} — probed: the only two
    non-content tokens in its 31-word vocabulary).

    Engine-exactness: word scores are integral quotients
    (deg·10⁶ div freq, shared truncation semantics) and phrase scores
    exact BIGINT sums of them; the top-20 ranks on
    (score desc, phrase asc), a total order. Phrase extraction is
    per-row HOFs (regex split on word-boundary stopwords → trim →
    drop empties) — identical fragment algebra in Java regex and RE2,
    no explode until phrases exist.

    Scale shape: phrase explode is linear in corpus size; word stats
    are one groupBy over a vocabulary-bounded key (the join back to
    score phrases is a dim join AQE can broadcast); phrase scoring
    groups DISTINCT phrases once (score is occurrence-invariant, so
    occurrences fold to a count before scoring — no score×n_occ
    inflation pass); final top-20 is TakeOrdered, never a global
    sort."""
    from datamodel_clinicaldata_spark.operators.ranking import topk_ranked

    d = read_table(spark, sf_dir, "documents")
    frags = F.split(F.col("text"), r"\b(?:a|the)\b")
    phrases = F.filter(
        F.transform(frags, lambda x: F.trim(x)), lambda x: x != ""
    )
    pocc = d.select(F.explode(phrases).alias("phrase"))
    words = F.split(F.col("phrase"), " ")
    pw = pocc.select(
        "phrase",
        F.explode(words).alias("word"),
        F.size(words).cast("long").alias("plen"),
    )
    ws = pw.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    ).withColumn("wscore_e6", F.expr("(deg * 1000000) div freq"))
    pd_ = pocc.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    pwd = pd_.select(
        "phrase", "n_occurrences", F.explode(words).alias("word")
    )
    scored = (
        pwd.join(ws.select("word", "wscore_e6"), "word")
        .groupBy("phrase", "n_occurrences")
        .agg(F.sum("wscore_e6").cast("long").alias("score_e6"))
    )
    return topk_ranked(
        scored, [F.col("score_e6").desc(), F.col("phrase").asc()], k=20
    ).select("phrase", "n_occurrences", "score_e6", "rank")


@register(
    "eval_langid_confusion",
    f"""
    WITH scored AS (
      SELECT lang,
             {_hits(LANG_MARKERS['en'])} AS s_en,
             {_hits(LANG_MARKERS['de'])} AS s_de,
             {_hits(LANG_MARKERS['fr'])} AS s_fr,
             {_hits(LANG_MARKERS['es'])} AS s_es
      FROM documents
    ),
    pred AS (
      SELECT lang,
             CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                  ELSE 'es' END AS lang_pred
      FROM scored
    ),
    cells AS (
      SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT lang, lang_pred, n,
           CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_actual,
           CAST(sum(n) OVER (PARTITION BY lang_pred) AS BIGINT) AS n_predicted,
           (n * 1000000) // CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT)
             AS recall_share_e6,
           (n * 1000000) // CAST(sum(n) OVER (PARTITION BY lang_pred) AS BIGINT)
             AS precision_share_e6
    FROM cells
    """,
)
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation confusion matrix for the language-ID heuristic
    against the labeled ``lang`` column — the quality-report surface a
    training-data pipeline publishes for every classifier-driven filter
    (per-cell counts plus row/column-normalized shares, i.e. the
    diagonal's recall and precision per class). Complements
    ``text_lang_id`` (which emits per-doc predictions): this is the
    aggregated evaluation artifact.

    Exactness: counts are BIGINT; the normalized shares are integral
    quotients against the margin totals (shared ``div``/``//``
    truncation). Margins come from two windows PARTITIONED over the
    ≤(|langs|+1)² cell frame — dimension-bounded, never global.

    Scale shape: the per-doc marker scoring is per-row HOFs in one
    scan; the only corpus-size shuffle is the (lang, lang_pred)
    conditional count to ≤36 cells; margins and shares are free."""
    from datamodel_clinicaldata_spark.functions.text import lang_id

    d = ensure_min_parallelism(read_table(spark, sf_dir, "documents"), "doc_id")
    cells = (
        d.select("lang", lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wr = Window.partitionBy("lang")
    wc = Window.partitionBy("lang_pred")
    return cells.select(
        "lang",
        "lang_pred",
        "n",
        F.sum("n").over(wr).cast("long").alias("n_actual"),
        F.sum("n").over(wc).cast("long").alias("n_predicted"),
    ).select(
        "lang",
        "lang_pred",
        "n",
        "n_actual",
        "n_predicted",
        F.expr("(n * 1000000) div n_actual").alias("recall_share_e6"),
        F.expr("(n * 1000000) div n_predicted").alias("precision_share_e6"),
    )


@register(
    "text_token_burstiness",
    """
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    tc AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY 1, 2
    ),
    m AS (
      SELECT tok,
             CAST(count(*) AS BIGINT) AS n_docs_containing,
             CAST(sum(c) AS HUGEINT) AS s,
             CAST(sum(c * c) AS HUGEINT) AS q
      FROM tc GROUP BY tok
    )
    SELECT m.tok,
           m.n_docs_containing,
           CAST(m.s AS BIGINT) AS total_count,
           CAST(((n.n_docs * m.q - m.s * m.s) * 1000000)
                // ((n.n_docs - 1) * m.s) AS BIGINT) AS dispersion_e6
    FROM m, n
    """,
)
def text_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token burstiness via the variance-to-mean dispersion index
    (Church & Gale 1995): over the FULL document universe (absent docs
    count as zero — the moment identity makes the zeros free),
    D = var/mean = (N·Σc² − S²) / ((N−1)·S). D ≈ 1 is Poisson
    (topic-neutral function words); D ≫ 1 is bursty (topical/
    boilerplate tokens that pile into few documents) — the lexical
    screen that separates stopword-like from content-bearing terms
    without a stopword list.

    Exactness: per-doc counts are BIGINT, the cleared-denominator form
    is one e6 integral quotient per token computed in HUGEINT/
    decimal(38,0) (N·Q passes int64 once corpora grow), zero floats.

    Scale shape: one (doc, token) count aggregate — the same shuffle
    every token statistic in this file pays — then a vocabulary-keyed
    moment fold (map-side combined); the 1-row doc total cross-joins
    back by broadcast (plan-folded, no second scan of the counts).
    Output is vocabulary-sized."""
    d = ensure_min_parallelism(read_table(spark, sf_dir, "documents"), "doc_id")
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    tc = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    m = tc.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_containing"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")
        ).alias("q"),
    )
    return m.crossJoin(F.broadcast(n)).select(
        "tok",
        "n_docs_containing",
        F.col("s").cast("long").alias("total_count"),
        F.expr(
            "CAST(((n_docs * q - s * s) * 1000000)"
            " div ((n_docs - 1) * s) AS BIGINT)"
        ).alias("dispersion_e6"),
    )


@register(
    "sample_balanced_downsample",
    """
    WITH m AS (
      SELECT CAST(min(n) AS BIGINT) AS cap
      FROM (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
    ),
    r AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY (CAST(doc_id AS HUGEINT) * 2654435761)
                        % 4294967296, doc_id
             ) AS BIGINT) AS rnk
      FROM documents
    )
    SELECT r.doc_id, r.lang, r.rnk
    FROM r, m WHERE r.rnk <= m.cap
    """,
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling — cap every language at the minority
    class's size (the standard rebalancing step before training a
    classifier on skewed labels). Selection within a class is a
    DETERMINISTIC pseudo-random order (Knuth multiplicative hash of
    doc_id, id tie-break), so the sample is reproducible, unbiased by
    ingestion order, and engine-identical — never ``ORDER BY rand()``.
    The cap is the exact min class count (plan-folded 1-row broadcast).

    Scale shape: per-class rank windows are PARTITIONED by lang; one
    class-count aggregate for the cap; the filter keeps ≤ cap·|classes|
    rows. The hot-class partition holds that class's rows — the same
    per-key bound every partitioned window in this repo carries."""
    from datamodel_clinicaldata_spark.functions.sampling import knuth_key

    d = read_table(spark, sf_dir, "documents")
    cap = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).agg(
        F.min("n").cast("long").alias("cap")
    )
    w = Window.partitionBy("lang").orderBy(
        (knuth_key("doc_id") % F.lit(4294967296)).asc(), F.col("doc_id").asc()
    )
    r = d.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("rnk")
    )
    return (
        r.crossJoin(F.broadcast(cap))
        .filter(F.col("rnk") <= F.col("cap"))
        .select("doc_id", "lang", "rnk")
    )


@register(
    "diag_duplicate_rate_by_source",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           (CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
            * 1000000) // CAST(count(*) AS BIGINT) AS dup_rate_e6
    FROM documents GROUP BY source
    """,
)
def diag_duplicate_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate — the ingest-quality scorecard
    (which feed is re-sending content?) that decides where dedup budget
    goes. One conditional count-distinct of 16-byte digests per source;
    the rate is an integral quotient of exact counts.

    Scale shape: one scan; the count-distinct shuffles (source, digest)
    pairs with map-side partial dedup — the exact-dedup shuffle shape,
    keyed by source."""
    d = read_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct(F.md5("text")).cast("long").alias("n_distinct"),
    ).select(
        "source",
        "n_docs",
        "n_distinct",
        F.expr("((n_docs - n_distinct) * 1000000) div n_docs").alias(
            "dup_rate_e6"
        ),
    )


@register(
    "text_vocab_growth_heaps",
    """
    WITH fo AS (
      SELECT tok, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY tok
    ),
    n AS (SELECT CAST(max(doc_id) AS BIGINT) AS max_id FROM documents)
    SELECT CAST(t.decile AS BIGINT) AS decile,
           CAST(n.max_id * t.decile // 10 AS BIGINT) AS doc_id_cutoff,
           CAST(count(*) FILTER (WHERE fo.first_doc
                                       <= n.max_id * t.decile // 10)
                AS BIGINT) AS vocab_size
    FROM fo, n, (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)) t(decile)
    GROUP BY t.decile, n.max_id
    """,
)
def text_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: distinct-token count as the
    corpus grows through 10 doc-id cutoffs — the companion diagnostic
    to ``text_zipf_fit`` (Zipf describes the frequency profile, Heaps
    the vocabulary's sub-linear growth V ≈ K·nᵝ; a growth curve that
    FLATTENS early flags a closed template vocabulary, one that stays
    linear flags noise/IDs). Computed from each token's FIRST-
    OCCURRENCE doc id (one groupBy), so the ten cumulative vocabulary
    sizes need ten conditional counts over the vocab frame — NOT ten
    distinct-count passes over the corpus.

    Exactness: integer ids, integer cutoffs (max_id·d/10 in integer
    division on both engines via the shared truncation), exact counts.

    Scale shape: one explode + one vocabulary-keyed min aggregate;
    the decile table cross-joins the VOCAB frame (vocabulary-sized,
    not corpus-sized); the max-id total broadcasts."""
    d = read_table(spark, sf_dir, "documents")
    fo = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").cast("long").alias("first_doc"))
    )
    n = d.agg(F.max("doc_id").cast("long").alias("max_id"))
    dec = spark.range(1, 11).select(F.col("id").cast("long").alias("decile"))
    j = fo.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(dec))
    return (
        j.groupBy("decile", "max_id")
        .agg(
            F.sum(
                (
                    F.col("first_doc")
                    <= F.expr("max_id * decile div 10")
                ).cast("long")
            )
            .cast("long")
            .alias("vocab_size")
        )
        .select(
            "decile",
            F.expr("max_id * decile div 10").alias(
                "doc_id_cutoff"
            ),
            "vocab_size",
        )
    )


@register(
    "text_hapax_ratio",
    f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS}) AS tok FROM documents
    ), tf AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS hapax_e6
    FROM tf GROUP BY 1
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax-legomena profile: the fraction of each source's
    vocabulary seen exactly once (plus the dis-legomena count — the
    Good-Turing mass estimators' raw inputs). A LOW hapax ratio flags a
    templated/closed vocabulary (boilerplate, generated text); a high
    one flags noise, IDs, or OCR damage — the cheap screen run before
    paying for LM-based quality scoring. Companion to the corpus-level
    ``text_vocab_growth_heaps`` / ``text_zipf_fit`` rows, sliced where
    curation acts: per source. All-integer output; the ratio is one e6
    integral quotient per source.

    Scale shape: one explode, one map-side-combined (source, tok) count
    shuffle, one vocabulary-sized per-source fold — no windows, no
    joins; the hot shuffle key is (source, tok), so a skewed source
    still spreads across its vocabulary."""
    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("hapax"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("dis"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.expr(
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000"
            " div count(*) AS BIGINT)"
        ).alias("hapax_e6"),
    )


@register(
    "text_source_vocab_jaccard",
    f"""
    WITH v AS (
      SELECT DISTINCT source, tok FROM (
        SELECT source, unnest({_TOKS}) AS tok FROM documents
      )
    ), sz AS (
      SELECT source, CAST(count(*) AS BIGINT) AS vsz FROM v GROUP BY 1
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, inter,
           sa.vsz AS vocab_a, sb.vsz AS vocab_b,
           CAST(inter * 1000000 // (sa.vsz + sb.vsz - inter) AS BIGINT)
             AS jaccard_e6
    FROM inter
    JOIN sz sa ON sa.source = source_a
    JOIN sz sb ON sb.source = source_b
    """,
)
def text_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between every pair of sources — the
    corpus-mixing diagnostic that says which slices are near-redundant
    (two crawls of the same site) vs complementary (code vs prose)
    BEFORE paying for document-level dedup across them. Exact set
    Jaccard on the per-source vocabularies: |A∩B| from a self-join of
    the distinct (source, token) frame on token, |A|,|B| from one
    vocabulary count, one e6 integral quotient.

    Scale shape: the self-join key is the TOKEN — a token appearing in
    k sources fans out to k(k−1)/2 pairs, bounded by the SOURCE count
    (tens-to-hundreds in any real mixture), not the corpus; the pair
    aggregate is |sources|²-sized and the vocab-size dim broadcasts
    onto it twice. No token list is ever collected; everything is one
    explode + two map-side-combined aggregates + one equi-join."""
    d = read_table(spark, sf_dir, "documents")
    v = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    sz = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("vsz"))
    a = v.select(F.col("source").alias("source_a"), "tok")
    b = v.select(F.col("source").alias("source_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return (
        inter.join(
            F.broadcast(sz.select(F.col("source").alias("source_a"),
                                  F.col("vsz").alias("vocab_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sz.select(F.col("source").alias("source_b"),
                                  F.col("vsz").alias("vocab_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "inter",
            "vocab_a",
            "vocab_b",
            F.expr(
                "CAST(inter * 1000000"
                " div (vocab_a + vocab_b - inter) AS BIGINT)"
            ).alias("jaccard_e6"),
        )
    )


@register(
    "text_intradoc_repetition",
    f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len({_TOKS}) - 7, 1) + 1),
               i -> array_to_string(({_TOKS})[i : i + 7], ' '))) AS g
      FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
           CAST((count(*) - count(DISTINCT g)) * 1000000 // count(*)
                AS BIGINT) AS dup_fraction_e6,
           ((count(*) - count(DISTINCT g)) * 10 > count(*) * 3) AS flagged
    FROM sh GROUP BY 1
    """,
)
def text_intradoc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition screen (Rae et al. 2021 §A1.1): the
    fraction of a document's 8-gram positions occupied by REPEATED
    8-grams — the within-document loop detector that catches template
    spam and generation loops, where ``text_shingle_novelty`` (cross-doc)
    and ``text_repetition_topgram`` (corpus-level) cannot: a document
    can be globally unique yet internally a single phrase repeated 500
    times. dup_fraction = 1 − distinct/total over the doc's 8-gram
    stream; documents flagged above 30% by exact integer cross-multiply
    (dup·10 > total·3 — no float share). Shingle grid matches the dedup
    family's SQL twin exactly: positions 1..max(n−7, 1), so sub-8-token
    docs contribute one truncated whole-doc gram.

    Scale shape: one explode + ONE per-doc aggregate (count + distinct
    ride the same (doc, gram) partial aggregation); no joins, no
    windows, shuffle keyed by doc_id — embarrassingly parallel at any
    corpus size.

    The gram carried through explode + distinct is ``xxhash64`` of the
    8-token slice, not the ~60-byte joined string (r8 verdict ask: the
    per-doc distinct was CPU/memory-bound on gram construction —
    hashing cut the row 7.6 s → ~0.5 s warm at sf0.1). Distinct-hash ==
    distinct-gram unless two of ONE document's grams collide in 64
    bits: P < n²·2⁻⁶⁵ ≈ 10⁻¹³ per 10⁴-gram doc — far below any
    tolerance that matters for a 30% repetition threshold. The oracle
    twin counts distinct raw grams (xxhash64 has no DuckDB twin), so a
    collision would surface as a hash-gate mismatch rather than pass
    silently. The token array is materialized as a column BEFORE the
    per-position lambda (HOF bodies re-evaluate embedded expressions
    per element — the regex split must not run once per position, see
    ``word_shingles``)."""
    d = ensure_min_parallelism(read_table(spark, sf_dir, "documents"), "doc_id")
    # Null/empty-text guard: size(NULL)=NULL makes greatest(n-7,1)=1 and
    # xxhash64(slice(NULL,1,8)) = the seed hash, so a null-text doc would
    # emit one PHANTOM gram — while the oracle's explode drops the row.
    # Filtering zero-token docs keeps both engines on "no gram stream".
    t = d.select("doc_id", tokens(F.col("text")).alias("__toks")).filter(
        F.size("__toks") > 0
    )
    n = F.size(F.col("__toks"))
    idx = F.sequence(F.lit(1), F.greatest(n - 7, F.lit(1)))
    gh = F.transform(idx, lambda i: F.xxhash64(F.slice(F.col("__toks"), i, 8)))
    g = t.select("doc_id", F.explode(gh).alias("g"))
    return g.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.count_distinct("g").cast("long").alias("n_distinct"),
        F.expr(
            "CAST((count(1) - count(DISTINCT g)) * 1000000"
            " div count(1) AS BIGINT)"
        ).alias("dup_fraction_e6"),
        ((F.count(F.lit(1)) - F.count_distinct("g")) * 10
         > F.count(F.lit(1)) * 3).alias("flagged"),
    )
