"""Deterministic sampling & split operators for training-data pipelines.

Every operator here derives its randomness from md5(seed:id) — NEVER
F.rand():

  * stage retries and speculative tasks reproduce the same rows
    (idempotence rule, SURVEY.md §4 determinism row);
  * the sample is stable across runs/partitionings, so downstream
    incremental stages (ledgers, dedup state) see a consistent corpus;
  * the hex-md5 prefix is engine-portable, so DuckDB oracles reproduce
    the EXACT row set — a seeded sample() could only be rows-only
    checked.

All ops are row-local projections/filters: no shuffle, no Exchange in
the plan — they evaluate inside the scan's whole-stage-codegen span
(an md5 expression is not a parquet-pushable predicate, so the bytes
are still read; what matters at 100 TB is that NOTHING moves: cost is
one pass over the scan, and the filter composes with whatever pushable
predicates surround it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TWO32 = 4294967296.0  # 2^32


def hash_uniform(id_col: str, seed: int = 0):
    """Deterministic uniform [0, 1) per id: the first 8 hex chars of
    md5('{seed}:{id}') as a 32-bit integer, scaled. Mirrors the DuckDB
    expression ('0x' || substr(md5(...), 1, 8))::BIGINT / 2^32."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"), F.col(id_col).cast("string")
                ).cast("binary")
            ),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    return h / F.lit(_TWO32)


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep ~fraction of rows, chosen by id hash — stable across runs,
    retries and partition layouts; disjoint seeds give independent
    samples. fraction in [0, 1]."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(hash_uniform(id_col, seed) < fraction)


def train_test_split(
    df: DataFrame, test_fraction: float = 0.1,
    id_col: str = "doc_id", seed: int = 0,
) -> DataFrame:
    """Tag each row 'test' (hash < test_fraction) or 'train' — a stable
    per-id assignment: a document keeps its split across corpus versions
    (new rows never reshuffle old ones — the property that prevents
    train/test leakage when the corpus grows incrementally)."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(
            f"test_fraction must be in [0,1], got {test_fraction}")
    return df.withColumn(
        "split",
        F.when(hash_uniform(id_col, seed) < test_fraction, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample dominant languages,
    keep all of rare ones). The per-stratum threshold attaches via a
    CASE chain over the (small, driver-known) fractions map — still a
    pure row-local filter, no join, no shuffle."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    thr = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(thr)
    return df.filter(hash_uniform(id_col, seed) < thr)
