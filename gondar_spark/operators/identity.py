"""Stable canonical entity ids across incremental runs (round-4 verdict
ask #2).

Connected-components labels are component MINIMA, so ingesting a new
lower-id member relabels the whole component — entity ids would churn
across runs, breaking every downstream consumer that joins on entity_id.
This module resolves each CC component to a FIRST-ASSIGNED stable id:

  * a component none of whose members ever had an id gets its CC label
    (= min member norm) as the id — the first assignment;
  * a component with exactly one previously-assigned id keeps it, even
    when a new lexicographically-smaller member arrived;
  * a component whose members carry SEVERAL previously-assigned ids is a
    MERGE: the surviving id is the minimum of the prior ids
    (deterministic), and every absorbed id is reported so the pipeline
    can record the merge in lineage.

Ids are norms, and a norm belongs to exactly one (append-only growing)
component forever, so a retired id can never be re-assigned to a
different entity — no collision by construction.

The pipeline persists the resulting (norm -> entity_id) mapping as the
``entity_ids`` ledger (segment-appended, latest-row-wins on a _seq
column) and feeds prior mappings back in on the next run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_stable_ids(
    labels: DataFrame,
    prior_map: DataFrame | None = None,
    prior_norms: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """labels(norm, component) -> (assign, merges).

    ``prior_map`` (norm, entity_id): the committed ledger — previously
    published ids per linked norm. ``prior_norms`` (norm): norms that
    existed in earlier runs as SINGLETONS (published with entity_id =
    own norm by materialize's coalesce); linking one into a component is
    also a merge of a previously-published entity and must keep/absorb
    its id deliberately, not silently.

    Returns:
      * assign  — (component, entity_id), one row per component;
      * merges  — (entity_id, absorbed_id, component): prior ids that
        stop existing this run, with the id that absorbed them.

    Both are small (∝ components / ∝ merges); the groupBy shuffles only
    (component, prior-id) pairs, never the corpus.
    """
    j = labels
    if prior_map is not None:
        j = j.join(
            prior_map.select("norm", F.col("entity_id").alias("_prior")),
            "norm",
            "left",
        )
    else:
        j = j.withColumn("_prior", F.lit(None).cast("string"))
    if prior_norms is not None:
        j = j.join(
            prior_norms.select("norm").distinct().withColumn(
                "_known", F.lit(True)
            ),
            "norm",
            "left",
        ).withColumn(
            "_prior",
            F.coalesce(
                "_prior", F.when(F.col("_known"), F.col("norm"))
            ),
        )
    prior_pairs = (
        j.filter(F.col("_prior").isNotNull())
        .select("component", "_prior")
        .distinct()
    )
    assign = (
        labels.select("component")
        .distinct()
        .join(
            prior_pairs.groupBy("component").agg(F.min("_prior").alias("_m")),
            "component",
            "left",
        )
        .select(
            "component",
            F.coalesce("_m", F.col("component")).alias("entity_id"),
        )
    )
    merges = (
        prior_pairs.join(assign, "component")
        .filter(F.col("_prior") != F.col("entity_id"))
        .select(
            "entity_id", F.col("_prior").alias("absorbed_id"), "component"
        )
    )
    return assign, merges
