"""Evaluation helpers: triple-level precision/recall vs golden fixtures
(the P/R >= 0.95 gate, /root/repo/BASELINE.json:2,6) and the per-row
sha256 source invariant."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEY = ["subj", "pred", "obj"]


def precision_recall(extracted: DataFrame, golden: DataFrame,
                     keys: list[str] = TRIPLE_KEY) -> tuple[float, float]:
    """Set-level P/R over distinct `keys` tuples. One job: full outer join
    on the key set, count matches/misses in a single aggregate."""
    e = extracted.select(*keys).distinct().withColumn("_e", F.lit(1))
    g = golden.select(*keys).distinct().withColumn("_g", F.lit(1))
    row = (
        e.join(g, keys, "full_outer")
        .agg(
            F.count(F.when(F.col("_e").isNotNull() & F.col("_g").isNotNull(), 1)
                    ).alias("tp"),
            F.count(F.when(F.col("_e").isNotNull() & F.col("_g").isNull(), 1)
                    ).alias("fp"),
            F.count(F.when(F.col("_e").isNull() & F.col("_g").isNotNull(), 1)
                    ).alias("fn"),
        )
        .collect()[0]
    )
    tp, fp, fn = row["tp"], row["fp"], row["fn"]
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    return precision, recall
