"""Incremental materialize: affected-group recomputation must be
EXACT-equal to a full materialize over the same state — same stable-id
ledger, same mentions/labels — across merges, new provenance on
untouched groups, and no-change runs."""

import pytest
from pyspark.sql import functions as F

from gondar_spark.config import JobConfig
from gondar_spark.pipeline import Pipeline
from gondar_spark.synth import SynthConfig, generate_source_df

from tests.test_incremental_linking import _src, _win

_OUT = [
    ("triples", ["subj", "pred", "obj", "kind", "repo", "path", "commit",
                 "chunk_id", "n_provenances"]),
    ("entities", ["entity_id", "canonical_form", "n_aliases", "n_mentions"]),
    ("aliases", ["entity_id", "alias", "lang"]),
]


def _snapshot(pipe):
    return {
        t: {tuple(r) for r in pipe.io.read(t).select(*cols).collect()}
        for t, cols in _OUT
    }


def _full_recompute_snapshot(spark, pipe, tmp_path, tag):
    """Full materialize over the SAME warehouse state: copy the ledger
    so the stable-id resolution matches, then run the full _mat path in
    a scratch warehouse and snapshot its outputs."""
    import shutil

    scratch = str(tmp_path / f"wh_full_{tag}")
    shutil.copytree(pipe.cfg.warehouse, scratch)
    ref = Pipeline(spark, JobConfig(warehouse=scratch, run_id="ref"))
    # drop the outputs + mat ledger so the full path recomputes them
    for t in ("triples", "entities", "aliases", "mat_done"):
        ref.io.drop(t)
    ref._materialize_stage(
        ref.io.read("mentions"), ref.io.read("labels"),
        ref.io.read("triples_raw"), force=True)
    return _snapshot(ref)


def test_incremental_materialize_exact_equal(spark, tmp_path):
    cfg = JobConfig(warehouse=str(tmp_path / "wh"), run_id="m1",
                    durable_link_state=True)
    pipe = Pipeline(spark, cfg)
    base = generate_source_df(
        spark, SynthConfig(n_files=60), partitions=4).unionByName(
        _src(spark, [("w2.py", _win(2)), ("w4.py", _win(4)),
                     ("w10.py", _win(10)), ("w12.py", _win(12))]))
    pipe.run(source_df=base)

    # ingest 1: a MERGE (bridge w6/w8), a new smallest member (w0), new
    # provenance rows for existing synth groups, brand-new synth files
    grown = generate_source_df(
        spark, SynthConfig(n_files=90), partitions=4).unionByName(
        _src(spark, [("w2.py", _win(2)), ("w4.py", _win(4)),
                     ("w10.py", _win(10)), ("w12.py", _win(12)),
                     ("w0.py", _win(0)), ("w6.py", _win(6)),
                     ("w8.py", _win(8))]))
    pipe.run(source_df=grown, incremental=True)
    recs = [r for r in pipe.lineage()
            if r["stage"] == "materialize" and r.get("incremental")]
    assert recs and not recs[-1].get("skipped"), \
        "incremental materialize path did not run"
    got = _snapshot(pipe)
    want = _full_recompute_snapshot(spark, pipe, tmp_path, "g1")
    for t, _cols in _OUT:
        assert got[t] == want[t], f"{t}: incremental != full recompute"

    # ingest 2: pure provenance growth (same mentions, no link change)
    grown2 = grown.unionByName(_src(spark, [("w2b.py", _win(2))]))
    pipe.run(source_df=grown2, incremental=True)
    got = _snapshot(pipe)
    want = _full_recompute_snapshot(spark, pipe, tmp_path, "g2")
    for t, _cols in _OUT:
        assert got[t] == want[t], f"{t} after ingest 2"

    # no-change run: outputs untouched, stage logs a skip
    pipe.run(source_df=grown2, incremental=True)
    recs = [r for r in pipe.lineage() if r["stage"] == "materialize"]
    assert recs[-1].get("skipped")


def test_incremental_materialize_crash_replay(spark, tmp_path):
    """Kill the run before mat_done advances (outputs already written):
    the replay must converge to the same exact outputs, no duplicates."""
    from tests.test_incremental_linking import _crash_on

    cfg = JobConfig(warehouse=str(tmp_path / "wh"), run_id="m1",
                    durable_link_state=True)
    pipe = Pipeline(spark, cfg)
    run1 = _src(spark, [("a.py", _win(2)), ("b.py", _win(4))])
    pipe.run(source_df=run1)

    both = run1.unionByName(_src(spark, [("c.py", _win(0)),
                                         ("d.py", _win(6))]))
    restore = _crash_on(pipe.io, "append", "mat_done")
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipe.run(source_df=both, incremental=True)
    restore()
    pipe.run(source_df=both, incremental=True)

    got = _snapshot(pipe)
    want = _full_recompute_snapshot(spark, pipe, tmp_path, "crash")
    for t, cols in _OUT:
        assert got[t] == want[t], f"{t} after crash replay"
        df = pipe.io.read(t)
        assert df.count() == df.select(cols).distinct().count()


def test_incremental_materialize_opt_out(spark, tmp_path):
    """``incremental_materialize=False`` keeps incremental linking but
    takes the FULL materialize path (the cost knob for rewrite-dominated
    sinks; BENCH/BASELINE.md 50k-campaign crossover) — outputs must be
    identical to the splice's."""
    def _seed(wh, run_id):
        pipe = Pipeline(spark, JobConfig(warehouse=str(tmp_path / wh),
                                         run_id=run_id,
                                         durable_link_state=True))
        pipe.run(source_df=_src(spark, [("a.py", _win(2)),
                                        ("b.py", _win(4))]))
        return pipe

    grown = _src(spark, [("a.py", _win(2)), ("b.py", _win(4)),
                         ("c.py", _win(0)), ("d.py", _win(6))])

    inc = _seed("wh_inc", "inc")
    inc.run(source_df=grown, incremental=True)
    assert any(r.get("incremental") for r in inc.lineage()
               if r["stage"] == "materialize")

    full = _seed("wh_full", "full")
    full.run(source_df=grown, incremental=True,
             incremental_materialize=False)
    mats = [r for r in full.lineage() if r["stage"] == "materialize"]
    assert not any(r.get("incremental") for r in mats)
    assert not mats[-1].get("skipped")

    assert _snapshot(inc) == _snapshot(full)
