"""Text-analysis functions for large-scale training-data pipelines:
token counting, quality scoring, language-ID scoring, fingerprinting.

All pure built-in column expressions (whole-stage codegen, no Python),
each with an exact DuckDB-SQL mirror in __spark_entry__.oracle_sql().
Generalizes the reference's text-normalization operators (A5-A7,
/root/reference/gondar/tools/entrez.py:14-68) into reusable scoring fns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .numeric import round_half_up

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# tiny per-language marker sets for the n-gram/stopword language heuristic;
# scores are deterministic counts, argmax with fixed tie-break order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "shi", "zai", "le"),
}


def tokens_col(col: str = "text") -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    c = F.col(col)
    return F.when(
        ~c.rlike(r"\S"), F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(c), r"\s+"))


def with_token_count(df: DataFrame, col: str = "text") -> DataFrame:
    return df.withColumn("token_count", F.size(tokens_col(col)).cast("long"))


def with_quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length, mean token length,
    stopword ratio, punctuation ratio, composite score (rounded for
    cross-engine comparability)."""
    toks = tokens_col(col)
    n_tok = F.size(toks)
    c = F.col(col)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))
    return (
        df.withColumn("token_count", n_tok.cast("long"))
        .withColumn(
            "mean_token_len",
            round_half_up(
                F.when(n_tok > 0,
                       F.length(F.regexp_replace(c, r"\s+", "")) / n_tok
                       ).otherwise(F.lit(0.0)),
                4,
            ),
        )
        .withColumn(
            "stopword_ratio",
            round_half_up(
                F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0)), 4
            ),
        )
        .withColumn(
            "punct_ratio",
            round_half_up(
                F.when(F.length(c) > 0, punct / F.length(c)).otherwise(
                    F.lit(0.0)
                ),
                4,
            ),
        )
        .withColumn(
            "quality_score",
            round_half_up(
                F.least(F.lit(1.0), n_tok / F.lit(64.0)) * 0.5
                + F.col("stopword_ratio") * 0.3
                + (F.lit(1.0) - F.least(F.lit(1.0), F.col("punct_ratio") * 10))
                * 0.2,
                4,
            ),
        )
    )


def with_lang_scores(df: DataFrame, col: str = "text") -> DataFrame:
    """Language-ID heuristic: per-language marker-token counts + argmax
    prediction with a fixed CASE tie-break (en > es > de > fr > zh)."""
    toks = tokens_col(col)
    out = df
    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long"),
        )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    expr = None
    for lg in langs:  # first lang reaching the max wins (stable tie-break)
        cond = F.col(f"score_{lg}") == best
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    return out.withColumn("lang_pred", expr)


def winnowing_fingerprints(
    df: DataFrame, col: str = "text", id_col: str = "doc_id",
    k: int = 3, w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the rolling-hash local fingerprinting scheme): hash every word
    k-gram positionally, slide a window of w hashes, keep each window's
    minimum, emit the distinct minima as (id, fp) rows. Guarantees any
    shared run of >= w+k-1 words yields a shared fingerprint.

    Pure column ops (md5-based, so the DuckDB oracle matches exactly);
    token array materialized once (HOF-CSE rule).
    """
    base = df.select(F.col(id_col).alias("id"), tokens_col(col).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    kgrams = F.when(
        n < k, F.array(F.md5(F.concat_ws(" ", toks).cast("binary")))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(
                F.concat_ws(" ", F.slice(toks, i + 1, k)).cast("binary")
            ),
        )
    )
    staged = base.select("id", kgrams.alias("_kg"))
    kg = F.col("_kg")
    m = F.size(kg)
    fps = F.when(m < w, F.array(F.array_min(kg))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), m - w),
                lambda j: F.array_min(F.slice(kg, j + 1, w)),
            )
        )
    )
    return staged.select(
        F.col("id").alias(id_col), F.explode(fps).alias("fp")
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-style retrieval scoring against a fixed term set, with a
    RATIONAL idf — idf_t = (N - df_t + 0.5) / (df_t + 0.5) instead of its
    logarithm — so every operation is +,-,*,/ on doubles (IEEE-exact and
    identical across engines; log is not correctly-rounded-guaranteed and
    would make the cross-engine oracle flaky at rounding boundaries).
    Monotone in the classic BM25 per term, so rankings per term agree;
    documented as the 'bm25-lite' variant.

    Everything is two scans expressed declaratively: one tiny aggregate
    for (N, avgdl, df_t) — broadcast as a 1-row cross join — and one
    scoring pass. tf is computed per term from the SAME materialized
    token array (HOF-CSE rule).
    """
    base = df.select(F.col(id_col), tokens_col(col).alias("_toks"))
    toks = F.col("_toks")
    tf_cols = [
        F.size(F.filter(toks, lambda t: t == F.lit(term)))
        .cast("double").alias(f"_tf{i}")
        for i, term in enumerate(terms)
    ]
    with_tf = base.select(
        id_col, F.size(toks).cast("double").alias("_dl"), *tf_cols
    )
    stats = with_tf.agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum(F.when(F.col(f"_tf{i}") > 0, 1.0).otherwise(0.0))
            .alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    joined = with_tf.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl") / F.col("_n")
    score = None
    for i in range(len(terms)):
        idf = (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        tf = F.col(f"_tf{i}")
        part = idf * (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * F.col("_dl") / avgdl)
        )
        score = part if score is None else score + part
    return joined.select(
        id_col, round_half_up(score, 6).alias("bm25")
    )


def with_fingerprints(df: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprints:
      * fp_exact   — md5 of whitespace-normalized lowercase text,
      * fp_minshingle — min over word-3-gram shingles of md5(shingle)
        (a 1-hash MinHash: equal fingerprints => likely near-duplicates,
        the winnowing-style content fingerprint).
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))
    # materialize the token array once — referencing an inline split()
    # inside the transform() lambda would re-tokenize per shingle (no CSE
    # across higher-order-function boundaries)
    base = df.withColumn("_toks", tokens_col(col))
    toks = F.col("_toks")
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ).cast("binary")
        ),
    )
    return (
        base.withColumn("fp_exact", F.md5(norm.cast("binary")))
        .withColumn(
            "fp_minshingle",
            F.when(n < 3, F.md5(norm.cast("binary"))).otherwise(
                F.array_min(shingles)
            ),
        )
        .drop("_toks")
    )
