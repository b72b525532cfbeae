"""gondar_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference (forsummer/Gondar, surveyed in /root/repo/SURVEY.md).

Pipeline stages (SURVEY.md §2B):
  source scan + sha256 pass -> chunk -> vectorized triple extraction
  -> mention normalization -> MinHash/LSH blocking -> candidate pairs
  -> pairwise scoring -> connected-components canonicalization
  -> triple/entity/alias materialization, with per-stage checkpoints,
  per-partition lineage metrics, and idempotent resume.

Everything is DataFrame-first: built-in pyspark.sql.functions in the hot
path, Arrow-vectorized ``mapInPandas`` only for the extractor and the
pairwise scorer, no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
