"""Extra benchmarks for the optimization round (guide §1.4): per-query
noop-sink timing with repeats, isolated from the frozen bench.py.

Usage:
  python bench_extra.py queries [name ...]     # per-query best-of-N
  python bench_extra.py cc                     # kg_cc_100k breakdown
  python bench_extra.py pipeline               # kg_pipeline_full breakdown

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GONDAR_XB_REPS (default 3).
Prints one JSON line per section. Numbers cited in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from gondar_spark.session import build_session  # noqa: E402

BENCH_QUERIES = [
    "mention_dictionary", "extraction_regex", "exact_dedup",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "simhash_pairs",
    "cosine_topk", "knn_per_probe", "quality_scores", "fingerprints",
    "pricing_summary", "top_revenue_orders", "nation_volume",
    "events_topk_users", "orders_running_total", "latest_event_per_user",
    "asof_event_lookup", "range_join_recent", "xml_body_sections",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _session():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="gondar_bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        arrow_batch_rows=int(os.environ.get("GONDAR_ARROW_ROWS", "512")),
        extra_conf={"spark.driver.memory":
                    os.environ.get("GONDAR_DRIVER_MEM", "8g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def bench_queries(names: list[str]) -> None:
    from gondar_spark.operators import dedup as dedup_ops

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("GONDAR_XB_REPS", "3"))
    spark = _session()
    qs = entrymod.queries()
    # warm pagecache + JIT like bench.py does
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "nation", "region", "part"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    out = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"xb:{name}")
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
            dedup_ops.release_caches()
            spark.catalog.clearCache()
        out[name] = {"min": min(samples), "samples": samples}
        print(f"  {name}: {samples}", file=sys.stderr)
    print(json.dumps({"section": "queries", "sf_dir": sf_dir,
                      "timings": out}))
    spark.stop()


def bench_cc_breakdown() -> None:
    """Time the CC bench per round-count and with stage substructure."""
    from pyspark.sql import functions as F

    from gondar_spark.operators.cc import connected_components

    spark = _session()
    reps = int(os.environ.get("GONDAR_XB_REPS", "3"))

    def edges(n_edges=100_000):
        return spark.range(0, n_edges, 1, 32).select(
            F.concat(F.lit("n"), F.col("id")).alias("norm_a"),
            F.concat(
                F.lit("n"),
                F.when(F.col("id") % 100 == 0,
                       (F.col("id") / 100).cast("long"))
                .otherwise(F.col("id") + 1),
            ).alias("norm_b"),
        )

    samples = []
    for _ in range(reps):
        t0 = time.time()
        connected_components(edges(), max_iter=30).count()
        samples.append(round(time.time() - t0, 3))
    print(json.dumps({"section": "cc_100k", "samples": samples,
                      "min": min(samples)}))
    spark.stop()


def bench_pipeline_breakdown() -> None:
    """Full pipeline wall + per-stage attribution from lineage."""
    import shutil
    import tempfile

    from gondar_spark.config import JobConfig
    from gondar_spark.pipeline import Pipeline
    from gondar_spark.synth import SynthConfig, generate_source_df

    spark = _session()
    reps = int(os.environ.get("GONDAR_XB_REPS", "2"))
    results = []
    for _ in range(reps):
        wh = tempfile.mkdtemp(prefix="gondar_xb_wh_")
        try:
            cfg = JobConfig(warehouse=wh, run_id="bench")
            src = generate_source_df(
                spark, SynthConfig(n_files=2000, seed=5), partitions=32)
            pipe = Pipeline(spark, cfg)
            t0 = time.time()
            pipe.run(source_df=src)
            wall = round(time.time() - t0, 3)
            recs = pipe.lineage()
            stages = {}
            for r in recs:
                if "wall_s" in r:
                    stages[r["stage"]] = r["wall_s"]
            # timestamp gaps: attribute time not covered by stage walls
            ts = [(r["stage"], r.get("ts")) for r in recs]
            results.append({"wall": wall, "stages": stages,
                            "events": [(s, round(t - ts[0][1], 3))
                                       for s, t in ts]})
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    print(json.dumps({"section": "pipeline", "runs": results}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        bench_queries(sys.argv[2:] or BENCH_QUERIES)
    elif mode == "cc":
        bench_cc_breakdown()
    elif mode == "pipeline":
        bench_pipeline_breakdown()
    else:
        raise SystemExit(f"unknown mode {mode}")
