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


def test_incremental_ledger_zero_extractor_invocations(spark, tmp_path):
    """The done-file ledger: an unchanged corpus re-runs with ZERO
    extractor invocations — including files whose extraction yielded zero
    triples, which the pre-ledger anti-join on triples_raw re-extracted on
    every incremental run."""
    cfg = JobConfig(warehouse=str(tmp_path / "whl"), run_id="led")
    pipe = Pipeline(spark, cfg)
    base = generate_source_df(spark, SynthConfig(n_files=40), partitions=4)
    prose = spark.createDataFrame(
        [("orgx/repo", "docs/notes.txt", "c9", "python",
          "plain prose, no code symbols here")],
        ["repo", "path", "commit", "lang", "content"],
    )
    corpus = base.unionByName(prose)
    pipe.run(source_df=corpus)

    # zero-triple file: in the ledger, absent from triples_raw
    done = pipe.io.read("extract_done")
    n_done0 = done.count()
    assert done.filter(F.col("path") == "docs/notes.txt").count() == 1
    assert (pipe.io.read("triples_raw")
            .filter(F.col("path") == "docs/notes.txt").count() == 0)
    m0 = pipe.io.read("extract_metrics").count()
    assert m0 > 0

    executed = pipe.run(source_df=corpus, incremental=True)
    assert not executed["triples_raw"]
    rec = [r for r in pipe.lineage()
           if r["stage"] == "triples_raw_incremental"][-1]
    assert rec["n_todo"] == 0 and rec["new_rows"] == 0
    # zero extractor invocations: the per-batch __metric__ rows are the
    # invocation counter, and none were added
    assert pipe.io.read("extract_metrics").count() == m0

    # a genuinely new file extracts, advances the ledger AND the metrics
    extra = spark.createDataFrame(
        [("orgy/repo", "src/new.py", "c1", "python", "def newfn(ctx):")],
        ["repo", "path", "commit", "lang", "content"],
    )
    executed = pipe.run(source_df=corpus.unionByName(extra), incremental=True)
    assert executed["triples_raw"]
    assert pipe.io.read("extract_metrics").count() > m0
    assert pipe.io.read("extract_done").count() == n_done0 + 1


def test_zero_copy_source_registration(spark, tmp_path):
    """run(source_path=...) must not rewrite the corpus: the source table
    is a pointer manifest, the external data is untouched, and the final
    outputs equal the copying mode's."""
    import os

    src = generate_source_df(spark, SynthConfig(n_files=60), partitions=4)
    ext_dir = str(tmp_path / "external_corpus")
    src.write.partitionBy("lang").parquet(ext_dir)
    before = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(ext_dir) for f in fs
    )

    cfg = JobConfig(warehouse=str(tmp_path / "whz"), run_id="zc")
    pipe = Pipeline(spark, cfg)
    executed = pipe.run(source_path=ext_dir)
    assert executed["materialize"]

    # no full-corpus write: the source table dir holds ONLY the pointer
    src_dir = os.path.join(cfg.warehouse, cfg.source_table)
    assert os.listdir(src_dir) == ["_gondar_commit.json"]
    # the external data was read, never written
    after = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(ext_dir) for f in fs
    )
    assert after == before

    # outputs equal the copying mode bit-for-bit
    cfg2 = JobConfig(warehouse=str(tmp_path / "whc"), run_id="cp")
    pipe2 = Pipeline(spark, cfg2)
    pipe2.run(source_df=src)
    for t in ("triples", "entities", "aliases"):
        a, b = pipe.io.read(t), pipe2.io.read(t)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # resume: a second zero-copy run skips every stage
    assert not any(pipe.run(source_path=ext_dir).values())


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


def test_metric_rows_carry_partition_lineage(spark, tmp_path):
    """extract_metrics is per-PARTITION lineage: every batch metric row
    tags the physical partition that produced it, covering all input
    partitions — straggler/skew attribution after the fact."""
    import re

    from gondar_spark.config import JobConfig
    from gondar_spark.pipeline import Pipeline
    from gondar_spark.synth import SynthConfig, generate_source_df

    pipe = Pipeline(spark, JobConfig(warehouse=str(tmp_path / "wh"),
                                     run_id="plin"))
    pipe.run(source_df=generate_source_df(
        spark, SynthConfig(n_files=40), partitions=4))
    metrics = [r["metric"] for r in pipe.io.read("extract_metrics").collect()]
    pids = {int(m.group(1)) for m in
            (re.search(r"partition=(-?\d+)", s) for s in metrics) if m}
    assert pids and all(p >= 0 for p in pids)
    assert len(pids) >= 2  # multiple physical partitions represented
