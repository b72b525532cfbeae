"""File-level incremental resume (B12 anti-join), quarantine path, and a
giant-component CC stress test."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gondar_spark.config import JobConfig
from gondar_spark.operators.cc import connected_components
from gondar_spark.operators.extract import _extract_micro_batch
from gondar_spark.pipeline import Pipeline
from gondar_spark.synth import SynthConfig, generate_source_df


def test_incremental_extracts_only_new_files(spark, tmp_path):
    cfg = JobConfig(warehouse=str(tmp_path / "wh"), run_id="inc")
    pipe = Pipeline(spark, cfg)

    small = generate_source_df(spark, SynthConfig(n_files=80), partitions=4)
    pipe.run(source_df=small)
    t1 = pipe.io.read("triples_raw")
    n1 = t1.count()

    # grow the corpus: same generator, more files (first 80 identical)
    big = generate_source_df(spark, SynthConfig(n_files=120), partitions=4)
    executed = pipe.run(source_df=big, incremental=True)
    assert executed["triples_raw"]
    t2 = pipe.io.read("triples_raw")
    n2 = t2.count()
    assert n2 > n1
    # lineage records the incremental row delta
    inc = [r for r in pipe.lineage() if r["stage"] == "triples_raw_incremental"]
    assert inc and inc[-1]["new_rows"] == n2 - n1

    # equivalence: incremental result == from-scratch extraction
    cfg2 = JobConfig(warehouse=str(tmp_path / "wh2"), run_id="scratch")
    pipe2 = Pipeline(spark, cfg2)
    pipe2.run(source_df=big)
    scratch = pipe2.io.read("triples_raw")
    key = ["subj", "pred", "obj", "chunk_id"]
    assert t2.select(key).exceptAll(scratch.select(key)).count() == 0
    assert scratch.select(key).exceptAll(t2.select(key)).count() == 0

    # second incremental run with the same corpus: no new work
    executed = pipe.run(source_df=big, incremental=True)
    assert not executed["triples_raw"]


def test_quarantine_rows_on_extractor_failure():
    """A poisoned unit (non-string) exhausts retries and lands in
    quarantine with provenance — never a silent drop (A15)."""
    pdf = pd.DataFrame(
        {
            "repo": ["r", "r"],
            "path": ["ok.py", "bad.py"],
            "commit": ["c1", "c2"],
            "lang": ["python", "python"],
            "base_chunk": [0, 0],
            "unit": ["def alpha(ctx):", None],  # None -> .split raises
        }
    )
    cols = _extract_micro_batch(pdf, chunk_lines=64, max_retries=2)
    rows = list(zip(cols["subj"], cols["pred"], cols["obj"], cols["kind"]))
    assert ("r:ok.py", "defines_fn", "alpha", "symbol") in rows
    quarantined = [r for r in rows if r[1] == "__error__"]
    assert len(quarantined) == 1 and quarantined[0][0] == "r:bad.py"


def test_cc_giant_component_with_hub(spark):
    """Star-with-chains topology: one hub node (hot entity analog) plus
    chains — a 400-node single component; canonical = min member."""
    edges = [("hub", f"n{i:03d}") for i in range(200)]
    edges += [(f"n{i:03d}", f"m{i:03d}") for i in range(200)]
    df = spark.createDataFrame(edges, ["norm_a", "norm_b"])
    labels = connected_components(df, max_iter=30)
    comps = labels.select("component").distinct().collect()
    assert [r["component"] for r in comps] == ["hub"]
    assert labels.count() == 401
