"""Ledger-growth benchmark (round-3 verdict item 7's done criterion):
incremental run cost must stay ~FLAT as the extract_done ledger grows
10x — the segmented-append design pays O(new files) per run, where the
old design rewrote the whole ledger history every run.

Corpus grows by unioning fixed-size seed batches (same n_files per batch
keeps the synth repo mapping stable; distinct seeds give distinct
(repo, path, commit) keys), so every incremental run extracts exactly one
new batch while the ledger accumulates all previous ones.

Usage: python tools/bench_ledger.py [batch_files] [n_batches]
Prints one JSON line: per-run walls + the flatness ratio
(mean of last 3 walls / mean of first 3 walls — ~1.0 means flat,
the old full-rewrite design trends toward the ledger growth factor).
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


def main() -> None:
    batch_files = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if n_batches < 4:
        # head/tail flatness needs >= 3 walls on each end; fewer batches
        # would divide by a fixed 3 (bogus) or crash on an empty loop
        print("n_batches must be >= 4", file=sys.stderr)
        sys.exit(2)
    spark = build_session(
        app_name="gondar_bench_ledger", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="gondar_ledger_wh_")
    corpus_dir = tempfile.mkdtemp(prefix="gondar_ledger_corpus_")
    walls = []
    try:
        cfg = JobConfig(warehouse=wh, run_id="led0")
        pipe = Pipeline(spark, cfg)

        def add_batch(i: int) -> None:
            # ZERO-COPY shape: new files LAND in the corpus directory
            # (append), the pipeline registers a pointer — the 100 TB
            # ingestion mode. source_df mode would rewrite the whole
            # corpus per run and the measurement would be that copy,
            # not the ledger.
            generate_source_df(
                spark, SynthConfig(n_files=batch_files, seed=100 + i),
                partitions=8,
            ).write.mode("append").parquet(corpus_dir)

        add_batch(0)
        pipe.run(source_path=corpus_dir)  # full run seeds the warehouse
        stage_walls = []
        for i in range(1, n_batches):
            add_batch(i)
            pipe.cfg = JobConfig(warehouse=wh, run_id=f"led{i}")
            t0 = time.time()
            pipe.run(source_path=corpus_dir, incremental=True)
            walls.append(round(time.time() - t0, 3))
            # the LEDGER claim isolated: the extraction stage's wall
            # (anti-join + extract new batch + segment append). The
            # full-run wall also carries the linking stages, which
            # legitimately grow with the corpus (global near-dup graph).
            stage = [r for r in pipe.lineage()
                     if r["stage"] == "triples_raw" and "wall_s" in r]
            stage_walls.append(stage[-1]["wall_s"] if stage else None)
            n_led = pipe.io.read("extract_done").count()
            n_seg = len(pipe.io.segments("extract_done"))
            print(f"run {i}: wall {walls[-1]}s extract-stage "
                  f"{stage_walls[-1]}s ledger {n_led} segments {n_seg}",
                  file=sys.stderr)
        # pure ledger overhead: a NO-CHANGE run at the final ledger size
        # (anti-join finds nothing, zero extractor invocations, no write)
        pipe.cfg = JobConfig(warehouse=wh, run_id="lednoop")
        t0 = time.time()
        pipe.run(source_path=corpus_dir, incremental=True)
        noop_wall = round(time.time() - t0, 3)
        k = min(3, len(walls) // 2) or 1
        head = sum(walls[:k]) / k
        tail = sum(walls[-k:]) / k
        print(json.dumps({
            "batch_files": batch_files,
            "n_batches": n_batches,
            "walls_s": walls,
            "extract_stage_walls_s": stage_walls,
            "noop_run_wall_s": noop_wall,
            "flatness_tail_over_head": round(tail / head, 2),
            "ledger_rows_final": n_led,
        }))
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
