"""B6/B7: MinHash/LSH blocking + candidate pair generation — pure
DataFrame ops, fully JVM-side, deterministic.

Hand-rolled (SURVEY.md §2B B6) instead of pyspark.ml MinHashLSH so that
(a) hashing is md5-based and reproducible in the DuckDB oracle
character-for-character, and (b) there is no Python in the hot path.
The python mirror (extraction.spec.band_keys) computes the identical
keys — the fixture generator validates alias clusters against it.

Plan shape / scale notes:
  * char-3-gram explode -> ONE groupBy(norm) computing all H min-hashes
    as conditional aggregates (single shuffle, map-side partial min);
  * band keys derived in-row from the H signature columns (no shuffle);
  * blocks self-joined on band_key with norm_a < norm_b; AQE skew-join
    handles hot bands; an optional block-size cap drops degenerate
    mega-blocks (standard LSH guard at web scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Partition-prefix columns for the COMMITTED link state (round-5 verdict
# #1): link_signatures partitions on the first NORM_PREFIX_LEN hex chars
# of md5(norm), the band-membership table (link_bands) on the first
# BAND_PREFIX_LEN chars of the band key ("<band_idx>:<hex...>"). An
# incremental probe collects its batch's distinct prefixes (bounded:
# <= 256 / <= bands*16 strings) and reads ONLY the matching partitions —
# scan bytes track the batch, not the corpus.
NORM_PREFIX_LEN = 2     # 256 partitions
BAND_PREFIX_LEN = 3     # band digit + ':' + 1 hex char -> <= bands*16


def norm_prefix(col: str = "norm"):
    # 'p' guard: a purely-numeric prefix like "12" would trip Spark's
    # partition-column type inference into int, breaking string pruning
    return F.concat(
        F.lit("p"),
        F.substring(F.md5(F.col(col).cast("binary")), 1, NORM_PREFIX_LEN))


def band_prefix(col: str = "band_key"):
    return F.concat(F.lit("p"), F.substring(F.col(col), 1, BAND_PREFIX_LEN))


def gram_array(col: str = "norm", n: int = 3):
    """Distinct char n-grams as an array column; mirrors
    extraction.spec.char_ngrams (short strings -> themselves)."""
    c = F.col(col)
    return (
        F.when(F.length(c) == 0, F.array(F.lit("")))
        .when(F.length(c) < n, F.array(c))
        .otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.length(c) - n),
                    lambda i: c.substr(i + 1, F.lit(n)),
                )
            )
        )
    )


def minhash_signature_df(
    mentions: DataFrame,
    n_hashes: int = 16,
    seed: int = 1001,
    ngram: int = 3,
) -> DataFrame:
    """(norm) -> (norm, h0..h{H-1}, grams).

    h_k = min over grams of md5('{seed}:{k}:{gram}') — identical to the
    python/DuckDB mirror; hex md5 preserves order under string min.

    Round 6: computed IN-ROW (array_min over a transform of the grams
    array) instead of explode -> groupBy-min -> join-grams-back. Same
    md5 count, but the only shuffle left is the norm-distinct — the
    groupBy and the re-attach join are gone (2 Exchanges fewer in the
    edges stage and every kg_* linking query; values bit-identical)."""
    grams = mentions.select("norm").distinct().withColumn("grams", gram_array())

    def h_col(k: int):
        prefix = f"{seed}:{k}:"
        return F.array_min(
            F.transform(
                "grams",
                lambda g: F.md5(F.concat(F.lit(prefix), g).cast("binary")),
            )
        ).alias(f"h{k}")

    return grams.select("norm", *[h_col(k) for k in range(n_hashes)], "grams")


def band_keys_df(sig: DataFrame, n_hashes: int = 16, bands: int = 8,
                 lang_df: DataFrame | None = None) -> DataFrame:
    """signature columns -> exploded (norm, band_key) block table.

    ``lang_df`` (norm, lang pairs) enables lang-tagged blocking per the
    north star (/root/repo/BASELINE.json:6 "MinHash/LSH blocking on
    mention surface forms + language tags"): block keys become
    band#lang, so non-identical surface forms pair only within a shared
    language. Identical norms remain one node regardless (normalization
    unifies exact cross-language forms before blocking), so lang tagging
    narrows candidate generation without splitting exact matches.
    """
    rows = n_hashes // bands
    keys = F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                    ).cast("binary")
                ),
            )
            for b in range(bands)
        ]
    )
    blocks = sig.select("norm", F.explode(keys).alias("band_key"))
    if lang_df is not None:
        blocks = blocks.join(
            lang_df.select("norm", "lang").distinct(), "norm"
        ).select(
            "norm", F.concat_ws("#", "band_key", "lang").alias("band_key")
        )
    return blocks


def candidate_pairs(
    blocks: DataFrame, max_block_size: int | None = 10_000
) -> DataFrame:
    """B7: self-equi-join on band_key -> distinct (norm_a < norm_b) pairs.

    max_block_size drops degenerate mega-blocks (a block of size s yields
    s^2/2 pairs — at 10^12 files a runaway block is a job-killer; the cap
    bounds the quadratic term and is logged by the pipeline, never silent).
    """
    if max_block_size is not None:
        sizes = blocks.groupBy("band_key").agg(F.count("*").alias("_bs"))
        blocks = (
            blocks.join(sizes, "band_key")
            .filter(F.col("_bs") <= max_block_size)
            .drop("_bs")
        )
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col("a.norm") < F.col("b.norm"))
        .select(F.col("a.norm").alias("norm_a"), F.col("b.norm").alias("norm_b"))
        .distinct()
    )
