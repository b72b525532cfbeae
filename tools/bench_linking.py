"""Incremental-linking benchmark (round-4 verdict ask #1's done
criterion): the linking stages' wall for ingesting a FIXED-SIZE batch
must stay ~flat while the committed corpus grows 10x — the probe design
pays O(new batch) per ingest (signatures for new norms only, band-store
equi-join probe, CC on touched components), where the old design
re-blocked and re-labeled the whole corpus every run.

Method: two warehouses are seeded with corpora of 1 and 10 seed-batches
whose mention DICTIONARY also grows ~10x (each batch draws a fresh
random entity pool via its seed — a fixed pool would make the old
design accidentally cheap). The SAME new batch (yet another pool ->
genuinely new norms + store-probe hits) is then ingested incrementally
into each; we report the summed mentions+edges+labels walls from
lineage at both corpus sizes plus their ratio (~1.0 = flat, the
pre-round-5 full-relink design tracked the corpus growth factor). For
contrast, the 10x warehouse is then force-relinked from scratch and
that wall is reported as the cost the incremental path avoids.

Usage: python tools/bench_linking.py [base_files] [batch_files]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gondar_spark.config import JobConfig  # noqa: E402
from gondar_spark.pipeline import Pipeline  # noqa: E402
from gondar_spark.session import build_session  # noqa: E402
from gondar_spark.synth import SynthConfig, generate_source_df  # noqa: E402

_LINK_STAGES = ("mentions", "edges", "labels_incremental")


def _link_wall(pipe: Pipeline, run_id: str) -> float:
    recs = [r for r in pipe.lineage()
            if r.get("run_id") == run_id and r["stage"] in _LINK_STAGES
            and "wall_s" in r]
    return round(sum(r["wall_s"] for r in recs), 3)


def ingest_at_scale(spark, base_files: int, n_batches: int,
                    batch_files: int) -> dict:
    wh = tempfile.mkdtemp(prefix="gondar_link_wh_")
    corpus = tempfile.mkdtemp(prefix="gondar_link_corpus_")
    try:
        for j in range(n_batches):
            generate_source_df(
                spark, SynthConfig(n_files=base_files, seed=100 + j),
                partitions=32,
            ).write.mode("append").parquet(corpus)
        n_files = base_files * n_batches
        pipe = Pipeline(spark, JobConfig(warehouse=wh, run_id="seed"))
        t0 = time.time()
        pipe.run(source_path=corpus)
        seed_wall = round(time.time() - t0, 3)

        generate_source_df(
            spark, SynthConfig(n_files=batch_files, seed=999),
            partitions=8,
        ).write.mode("append").parquet(corpus)
        pipe.cfg = JobConfig(warehouse=wh, run_id="ingest")
        t0 = time.time()
        pipe.run(source_path=corpus, incremental=True)
        ingest_wall = round(time.time() - t0, 3)
        link_wall = _link_wall(pipe, "ingest")
        n_norms = pipe.io.read("mentions").select("norm").distinct().count()
        n_edges = pipe.io.read("edges").count()

        # the avoided cost: full relink of the grown corpus (same
        # warehouse, force recompute of mentions/edges/labels)
        pipe.cfg = JobConfig(warehouse=wh, run_id="relink")
        t0 = time.time()
        pipe.run(source_path=corpus, force=True)
        full_wall = round(time.time() - t0, 3)
        full_link_wall = round(sum(
            r["wall_s"] for r in pipe.lineage()
            if r.get("run_id") == "relink" and "wall_s" in r
            and r["stage"] in ("mentions", "edges", "labels")), 3)
        return {
            "n_files": n_files, "dict_norms": n_norms, "edges": n_edges,
            "seed_run_wall_s": seed_wall,
            "ingest_run_wall_s": ingest_wall,
            "link_wall_s": link_wall,
            "full_relink_link_wall_s": full_link_wall,
            "full_relink_run_wall_s": full_wall,
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(corpus, ignore_errors=True)


def main() -> None:
    base_files = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    batch_files = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    spark = build_session(
        app_name="gondar_bench_linking",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        small = ingest_at_scale(spark, base_files, 1, batch_files)
        big = ingest_at_scale(spark, base_files, 10, batch_files)
        ratio = (round(big["link_wall_s"] / small["link_wall_s"], 2)
                 if small["link_wall_s"] else None)
        print(json.dumps({
            "batch_files": batch_files,
            "at_1x": small,
            "at_10x": big,
            "link_wall_ratio_10x": ratio,
            "incremental_vs_full_relink_speedup_10x": round(
                big["full_relink_link_wall_s"] / big["link_wall_s"], 2)
            if big["link_wall_s"] else None,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
