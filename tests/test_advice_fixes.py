"""Regression tests for the round-1 ADVICE findings: bool env config,
crash-safe snapshot swap, quarantine persistence on zero-triple runs,
metric row accounting, and deterministic / TakeOrdered top-k."""

from __future__ import annotations

import json
import os
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gondar_spark.config import JobConfig
from gondar_spark.operators.extract import _extract_micro_batch
from gondar_spark.operators.topk import top_k_by_count
from gondar_spark.pipeline import Pipeline
from gondar_spark.sources.tables import TableIO, _COMMIT
from gondar_spark.synth import SynthConfig, generate_source_df


def test_from_env_bool_fields(monkeypatch):
    for raw, expected in [("false", False), ("0", False), ("no", False),
                          ("true", True), ("1", True), ("YES", True)]:
        monkeypatch.setenv("GONDAR_LINK_LANG_AWARE", raw)
        cfg = JobConfig.from_env()
        assert cfg.link_lang_aware is expected, (raw, cfg.link_lang_aware)
    monkeypatch.delenv("GONDAR_LINK_LANG_AWARE")
    monkeypatch.setenv("GONDAR_CHUNK_LINES", "32")
    assert JobConfig.from_env().chunk_lines == 32


def test_tableio_swap_recovery(spark, tmp_path):
    """A crash between moving the old snapshot aside and installing the
    new one must not lose the committed table: recovery restores the
    aside directory."""
    wh = str(tmp_path / "wh")
    io = TableIO(spark, wh, use_iceberg=False)
    df = spark.range(5).select(F.col("id").cast("long"))
    io.write(df, "t")
    assert io.read("t").count() == 5

    # simulate the crash window: old renamed aside, new never arrived
    final = os.path.join(wh, "t")
    aside = final + ".old-" + uuid.uuid4().hex[:8]
    os.rename(final, aside)
    assert not io.exists("t")

    io2 = TableIO(spark, wh, use_iceberg=False)   # recovery runs at init
    assert io2.exists("t")
    assert io2.read("t").count() == 5
    assert not os.path.exists(aside)

    # crash AFTER the swap: aside is stale and must be deleted, not restored
    io2.write(spark.range(7).select(F.col("id").cast("long")), "t")
    stale = final + ".old-deadbeef"
    os.makedirs(stale)
    with open(os.path.join(stale, _COMMIT), "w") as f:
        json.dump({"table": "t"}, f)
    io3 = TableIO(spark, wh, use_iceberg=False)
    assert not os.path.exists(stale)
    assert io3.read("t").count() == 7


def test_incremental_persists_quarantine_without_new_triples(spark, tmp_path):
    """Files whose extraction fails (quarantine rows, zero triples) must
    be persisted by the incremental run — and not duplicated by later
    incremental runs (A15: never silently drop)."""
    cfg = JobConfig(warehouse=str(tmp_path / "wh"), run_id="q",
                    extractor_max_retries=1)
    from gondar_spark.extraction.spec import poison_extractor

    pipe = Pipeline(spark, cfg, extractor=poison_extractor)

    base = generate_source_df(spark, SynthConfig(n_files=30), partitions=2)
    pipe.run(source_df=base)
    assert pipe.io.read("quarantine").count() == 0

    poison = spark.createDataFrame(
        [("org0/repo", "src/poison.py", "c0", "python", "POISON def x():")],
        ["repo", "path", "commit", "lang", "content"],
    )
    grown = base.unionByName(poison)
    executed = pipe.run(source_df=grown, incremental=True)
    assert executed["triples_raw"]  # quarantine write happened
    quar = pipe.io.read("quarantine")
    assert quar.count() == 1
    assert quar.first()["path"] == "src/poison.py"
    # triples unchanged (the poisoned file yielded none)
    inc = [r for r in pipe.lineage() if r["stage"] == "triples_raw_incremental"]
    assert inc[-1]["new_rows"] == 0 and inc[-1]["new_quarantine"] == 1

    # a second incremental run re-extracts the zero-triple file but must
    # not stack a duplicate quarantine row
    pipe.run(source_df=grown, incremental=True)
    assert pipe.io.read("quarantine").count() == 1


def test_metric_row_counts_triples_not_errors():
    pdf = pd.DataFrame(
        {
            "repo": ["r", "r"],
            "path": ["ok.py", "bad.py"],
            "commit": ["c1", "c2"],
            "lang": ["python", "python"],
            "base_chunk": [0, 0],
            "unit": ["def alpha(ctx):\nclass Beta:", None],
        }
    )
    cols = _extract_micro_batch(pdf, chunk_lines=64, max_retries=0)
    # simulate extract_triples' metric append logic
    n_triples = sum(1 for k in cols["kind"] if k != "error")
    assert n_triples == 2  # alpha + Beta; the __error__ row is excluded


def test_top_k_by_count_plan_and_ties(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 5 + [("c",)] * 3, ["k"]
    )
    top = top_k_by_count(df, "k", k=2)
    rows = top.collect()
    # deterministic tie-break: a before b at equal counts
    assert [(r["k"], r["cnt"]) for r in rows] == [("a", 5), ("b", 5)]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
