"""Determinism guarantees (SURVEY.md §7 design rule): results must be
independent of partitioning, and the extraction semantics are PINNED by
committed fixtures so symmetric generator+extractor drift can't silently
change the contract between rounds."""

import pandas as pd
from pyspark.sql import functions as F

from gondar_spark.operators import chunk, extract
from gondar_spark.synth import (
    SynthConfig,
    generate_source_df,
    golden_hashes_df,
    golden_triples_df,
)

CFG = SynthConfig(n_files=50)


def _extract_triples(spark, partitions):
    src = generate_source_df(spark, CFG, partitions=partitions)
    units = chunk.prepare_extraction_units(src, CFG.chunk_lines)
    raw = extract.extract_triples(units, chunk_lines=CFG.chunk_lines,
                                  emit_metrics=False)
    triples, _, _ = extract.split_extraction(raw)
    return triples


def test_extraction_partition_count_independent(spark):
    a = _extract_triples(spark, 2).collect()
    b = _extract_triples(spark, 13).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_golden_triples_match_committed_fixture(spark):
    got = (
        golden_triples_df(spark, CFG, 4)
        .toPandas()
        .sort_values(["subj", "pred", "obj", "chunk_id"])
        .reset_index(drop=True)
    )
    want = pd.read_parquet("tests/fixtures/golden_triples_n50_seed42.parquet")
    pd.testing.assert_frame_equal(got, want)


def test_golden_hashes_match_committed_fixture(spark):
    got = (
        golden_hashes_df(spark, CFG, 4)
        .toPandas()
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    want = pd.read_parquet("tests/fixtures/golden_hashes_n50_seed42.parquet")
    pd.testing.assert_frame_equal(got, want)


def test_pipeline_extraction_matches_committed_fixture(spark):
    """End to end against the PINNED fixture: the extractor recovers the
    committed golden triples exactly (not just the live generator's)."""
    triples = _extract_triples(spark, 4)
    got = {
        (r["subj"], r["pred"], r["obj"], r["chunk_id"])
        for r in triples.collect()
    }
    want_df = pd.read_parquet("tests/fixtures/golden_triples_n50_seed42.parquet")
    want = set(
        zip(want_df["subj"], want_df["pred"], want_df["obj"],
            want_df["chunk_id"])
    )
    assert got == want
