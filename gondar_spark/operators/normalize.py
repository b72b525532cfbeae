"""B5 mention normalization — built-in string functions only, mirroring
extraction.spec.normalize_surface exactly (lower + drop non-alnum).

The linkable mention set excludes module imports (kind='module'): dotted /
slashed paths are a different namespace than symbol/literal entities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINKABLE_KINDS = ("symbol", "literal")


def normalize_mentions(triples: DataFrame) -> DataFrame:
    """triples -> distinct (surface, lang, norm) mention forms.

    Distinct-first: linking cost scales with |distinct surface forms|,
    not |triples| — at 100 TB the distinct set is orders of magnitude
    smaller than the triple stream.
    """
    return (
        triples.filter(F.col("kind").isin(*LINKABLE_KINDS))
        .select(
            F.col("obj").alias("surface"),
            "lang",
            F.regexp_replace(F.lower(F.col("obj")), "[^a-z0-9]+", "").alias("norm"),
        )
        .filter(F.length("norm") > 0)
        .distinct()
    )


def norm_col(col: str):
    return F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9]+", "")
