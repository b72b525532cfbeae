"""B8: pairwise link scoring — char-n-gram Jaccard, pure column ops.

F.array_intersect over the (distinct) gram arrays keeps scoring inside
whole-stage codegen; no Python. A levenshtein-based score is provided as
an alternative (F.levenshtein is also JVM-side). Threshold filtering
yields the mention-similarity edge list consumed by connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_pairs(pairs: DataFrame, sig: DataFrame, threshold: float = 0.60) -> DataFrame:
    """pairs(norm_a, norm_b) x sig(norm, grams) -> scored edges.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) over distinct gram sets —
    identical to extraction.spec.jaccard and the DuckDB oracle.
    """
    grams = sig.select("norm", "grams")
    scored = (
        pairs.join(grams.withColumnsRenamed({"norm": "norm_a", "grams": "grams_a"}),
                   "norm_a")
        .join(grams.withColumnsRenamed({"norm": "norm_b", "grams": "grams_b"}),
              "norm_b")
        .withColumn("inter", F.size(F.array_intersect("grams_a", "grams_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("grams_a") + F.size("grams_b") - F.col("inter")),
        )
        .select("norm_a", "norm_b", "jaccard")
    )
    return scored.filter(F.col("jaccard") >= threshold)


def edit_similarity(pairs: DataFrame) -> DataFrame:
    """Alternative scorer: normalized Levenshtein similarity (JVM-side)."""
    return pairs.withColumn(
        "edit_sim",
        1.0
        - F.levenshtein("norm_a", "norm_b")
        / F.greatest(F.length("norm_a"), F.length("norm_b")),
    )
