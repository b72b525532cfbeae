"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "extraction": {"n_files": N, "docs_per_sec": T, "cpus": C},
   "pipeline_stages": {stage: sec, ...}, "extras_file": "BENCH/..."}

That line is the LAST stdout line and stays compact; the scaling_10x and
sf1 campaign payloads are written to BENCH/extras_latest.json instead
(round 3's combined line outgrew the driver's tail capture).

The extraction entry is the north-rule metric (documents/sec through the
chunk+mapInPandas extract stage); tools/bench_scaling.py runs THIS script
at two parallelism levels (local[8] vs local[32]) to produce the
N-vs-4N scaling-efficiency evidence in BENCH/BASELINE.md.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GONDAR_BENCH_FILES,
GONDAR_BENCH_ONLY=extraction (skip table queries; used by the scaling
harness).
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
    "mention_dictionary",
    "extraction_regex",
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "cosine_topk",
    "knn_per_probe",
    "quality_scores",
    "fingerprints",
    "pricing_summary",
    "top_revenue_orders",
    "nation_volume",
    "events_topk_users",
    "orders_running_total",
    "latest_event_per_user",
    "asof_event_lookup",
    "range_join_recent",
    "xml_body_sections",
]


def _force(df) -> int:
    """Fully materialize (noop sink exercises every column, unlike count)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def bench_extraction(spark, n_files: int) -> dict:
    """documents/sec through scan -> chunk -> mapInPandas extract."""
    from gondar_spark.operators import chunk, extract
    from gondar_spark.synth import SynthConfig, generate_source_df

    sc = spark.sparkContext
    parallelism = sc.defaultParallelism
    fmin, fmax = (
        int(x) for x in os.environ.get("GONDAR_BENCH_FACTS", "3,12").split(",")
    )
    cfg = SynthConfig(n_files=n_files, seed=7, facts_min=fmin, facts_max=fmax)
    # fine-grained partitions: at K task slots, K*2 partitions = 2 waves and
    # one skewed partition stalls the whole job; K*8 keeps slots fed
    src = generate_source_df(spark, cfg, partitions=parallelism * 8)
    # materialize the corpus first so extraction timing excludes generation
    src = src.persist()
    src.count()

    def run_extraction(df) -> int:
        units = chunk.prepare_extraction_units(df, 64)
        raw = extract.extract_triples(units, chunk_lines=64,
                                      emit_metrics=False)
        triples, _, _ = extract.split_extraction(raw)
        return triples.count()

    # warm-up: spin up every Python worker (fork + pandas/pkg imports) and
    # JIT the codegen'd stages — otherwise cold-start cost scales with the
    # worker count and poisons the N-vs-4N comparison (measured: a cold
    # local[32] run spends ~25s on startup a warm one doesn't)
    run_extraction(
        generate_source_df(
            spark, SynthConfig(n_files=parallelism * 64, seed=13),
            partitions=parallelism * 2,
        )
    )

    # best-of-N timed reps: single-JVM local mode has noisy cold paths
    # (GC sizing, code cache); steady-state min is the honest throughput
    reps = int(os.environ.get("GONDAR_BENCH_REPS", "2"))
    dt = float("inf")
    n_triples = 0
    for _ in range(max(1, reps)):
        t0 = time.time()
        n_triples = run_extraction(src)
        dt = min(dt, time.time() - t0)
    src.unpersist()
    return {
        "n_files": n_files,
        "n_triples": n_triples,
        "sec": round(dt, 3),
        "docs_per_sec": round(n_files / dt, 2),
        "cpus": parallelism,
        # corpus density context: BENCH/BASELINE.md's scaling numbers use
        # dense files (GONDAR_BENCH_FACTS=120,240), this default uses the
        # sparse profile — docs/sec is not comparable across densities
        "facts_per_file": f"{fmin}-{fmax}",
    }


def bench_full_pipeline(spark, n_files: int = 2000,
                        return_stages: bool = False):
    """Wall-clock of the whole staged job (extract -> link -> CC ->
    materialize) including snapshot writes, on a temp warehouse.
    ``return_stages=True`` additionally returns per-stage wall seconds
    from the pipeline's own lineage log, so a slow headline number can be
    attributed to a stage (code regression) vs spread evenly (host window
    noise) without a re-run."""
    import shutil
    import tempfile

    from gondar_spark.config import JobConfig
    from gondar_spark.pipeline import Pipeline
    from gondar_spark.synth import SynthConfig, generate_source_df

    wh = tempfile.mkdtemp(prefix="gondar_bench_wh_")
    try:
        cfg = JobConfig(warehouse=wh, run_id="bench")
        src = generate_source_df(
            spark, SynthConfig(n_files=n_files, seed=5), partitions=32
        )
        pipe = Pipeline(spark, cfg)
        t0 = time.time()
        pipe.run(source_df=src)
        wall = round(time.time() - t0, 3)
        if return_stages:
            stages = {r["stage"]: r["wall_s"] for r in pipe.lineage()
                      if "wall_s" in r}
            return wall, stages
        return wall
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def bench_cc(spark, n_edges: int = 100_000) -> float:
    """Connected components on a 100k-edge graph (chains hanging off hubs
    — deep components force several large/small-star rounds)."""
    from pyspark.sql import functions as F

    from gondar_spark.operators.cc import connected_components

    e = spark.range(0, n_edges, 1, 32).select(
        F.concat(F.lit("n"), F.col("id")).alias("norm_a"),
        F.concat(
            F.lit("n"),
            F.when(F.col("id") % 100 == 0, (F.col("id") / 100).cast("long"))
            .otherwise(F.col("id") + 1),
        ).alias("norm_b"),
    )
    t0 = time.time()
    connected_components(e, max_iter=30).count()
    return round(time.time() - t0, 3)


# queries probed for super-linear scaling (the dedup/linking family — the
# ones where a hidden quadratic term would sink a real 10x scale-up)
SCALING_QUERIES = [
    "exact_dedup",
    "mention_dictionary",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    # the composed cleaning chain (quality gate -> exact dedup -> LSH+CC
    # removal): it stacks the three heaviest stages, so its 10x ratio is
    # the single most user-relevant scaling number (round-4 verdict #6)
    "corpus_clean",
]


def _ann_scaling_probes():
    """FULL-CORPUS ANN probes for the scaling campaign. The registry's
    oracled ANN queries pin constant working sets (5 probes / the
    vec_id<150 planted corpus) so their 10x ratio would measure overhead,
    not the operator; these run the same operators in the corpus-scale
    shape: every vector probes the index (ANN self-kNN — the self-dedup
    access pattern) and near-dup blocks over ALL vectors.

    The cell count scales WITH the corpus (k ~ n/128, the 100 TB design:
    cell SIZE held constant, so per-cell join work stays flat and total
    work grows linearly — a fixed k would make the cell joins quadratic
    in the growth factor by construction). Training cost amortizes out
    via the per-dir centroid cache (best-of-N reps — the build-once/
    query-many serving shape), so ratios isolate the assignment +
    cell-join + verify scaling."""
    from gondar_spark.operators import similarity

    cache: dict = {}

    def cents(spark, d):
        if d not in cache:
            emb = spark.read.parquet(f"{d}/embeddings.parquet")
            k = max(16, emb.count() // 128)
            cache[d] = similarity.kmeans_train(emb, k=k, n_iter=2)
        return cache[d]

    def p_ivf_knn_self(spark, d):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return similarity.ivf_topk_per_probe(
            emb, emb, cents(spark, d), k=5, n_probe=2)

    def p_near_dup_full(spark, d):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return similarity.embedding_near_dup(
            emb, cents(spark, d), threshold=0.99, n_probe=2)

    return {
        "ivf_knn_self_full": p_ivf_knn_self,
        "embedding_near_dup_ivf_full": p_near_dup_full,
    }


def bench_scaling_10x(spark, sf_dir: str) -> dict:
    """Per-query data-scaling ratios: run each probe query on the sf
    corpus and on a 10x replicated-but-distinct corpus (each replica's
    text is suffixed with a replica token, so shingle/band structure
    scales the way real corpus growth does instead of creating artificial
    100%-duplicate groups). ratio ~= 10 means linear; >> 10 flags a
    quadratic term before a real scale-up finds it."""
    import tempfile

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # every TOKEN gets a replica tag (r1word ...), keeping token/shingle
    # counts identical to the sf corpus while making replica shingle sets
    # fully disjoint. (A suffix-only tag leaves ~90% of word shingles
    # shared across replicas — that corpus is quadratically near-dup BY
    # CONSTRUCTION and any correct exact join must emit the O(n^2/10)
    # pair blow-up; measured: an 80 GB verify-join spill. Linear scaling
    # is only measurable on a corpus whose true answer scales linearly.)
    replicas = [
        docs.select(
            (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
            (F.regexp_replace(F.col("text"), r"(\S+)", f"r{i}$1") if i
             else F.col("text")).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(10)
    ]
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)

    # materialize the 10x corpus to parquet so scans cost the same shape
    # as the sf table (a cached union would dodge the IO the sf run pays);
    # the probe queries read documents + embeddings only
    tmp = tempfile.mkdtemp(prefix="gondar_scale10_")
    big.repartition(32).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # replica i = CYCLIC DIMENSION SHIFT by 7*i: cross-replica cosines stay
    # low for generic vectors, so the 10x corpus's true near-dup answer
    # grows ~linearly (an additive shift or pure scale would make every
    # replica a near-dup of its source — a quadratic answer BY
    # CONSTRUCTION, same trap as suffix-tagged documents above)
    dim = len(emb.select("embedding").first()["embedding"])
    emb_reps = [
        emb.select(
            (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.element_at(
                    F.col("embedding"), ((j + F.lit(7 * i)) % dim) + 1
                ),
            ).alias("embedding"),
            "label",
        )
        for i in range(10)
    ]
    emb_big = emb_reps[0]
    for r in emb_reps[1:]:
        emb_big = emb_big.unionByName(r)
    emb_big.repartition(32).write.mode("overwrite").parquet(
        f"{tmp}/embeddings.parquet")

    qs = entrymod.queries()
    out = {}
    from gondar_spark.operators import dedup as dedup_ops

    # best-of-N per point: single-shot probes on this shared host swing
    # several-x between runs (pagecache / AQE warm state), which turns a
    # ~2x true ratio into anything from 1 to 10; the min of N=2 is stable
    reps = int(os.environ.get("GONDAR_BENCH_SCALE_REPS", "2"))

    def probe(fn, d):
        best = float("inf")
        for _ in range(reps):
            dedup_ops.release_caches()
            spark.catalog.clearCache()  # no cross-probe cache bleed
            t0 = time.time()
            _force(fn(spark, d))
            best = min(best, time.time() - t0)
        return best

    probes = {name: qs[name] for name in SCALING_QUERIES}
    probes.update(_ann_scaling_probes())
    for name, fn in probes.items():
        t1 = probe(fn, sf_dir)
        t10 = probe(fn, tmp)
        out[name] = {
            "t_sf": round(t1, 3),
            "t_10x": round(t10, 3),
            "ratio": round(t10 / t1, 2) if t1 > 0 else None,
        }
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return out


def _docs_10x(docs):
    """10 replicas with disjoint shingle structure (every token tagged —
    see bench_scaling_10x's note on why suffix-only tags measure a
    quadratically-near-dup corpus instead of linear growth)."""
    from pyspark.sql import functions as F

    replicas = [
        docs.select(
            (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
            (F.regexp_replace(F.col("text"), r"(\S+)", f"r{i}$1") if i
             else F.col("text")).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(10)
    ]
    out = replicas[0]
    for r in replicas[1:]:
        out = out.unionByName(r)
    return out


def build_sf1_dir(spark, sf_dir: str) -> str:
    """Materialize a FULL synthetic sf1 (10x sf0.1) table set: fact tables
    replicate with offset keys (consistent FKs), dimension tables copy
    as-is, document text is token-tagged per replica, embeddings get a
    direction-changing per-replica shift (a pure scale would be
    cosine-identical). Deterministic — no randomness."""
    import tempfile

    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="gondar_sf1_")

    def mat(name, df, parts=32):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{tmp}/{name}.parquet")

    def rep10(df, offsets: dict, transform=None):
        outs = []
        for i in range(10):
            r = df
            for col, step in offsets.items():
                r = r.withColumn(col, F.col(col) + F.lit(step * i))
            if transform is not None:
                r = transform(r, i)
            outs.append(r)
        big = outs[0]
        for r in outs[1:]:
            big = big.unionByName(r)
        return big

    mat("documents", _docs_10x(
        spark.read.parquet(f"{sf_dir}/documents.parquet")))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mat("embeddings", rep10(
        emb, {"vec_id": 1_000_000},
        transform=lambda df, i: df.withColumn(
            "embedding",
            F.transform("embedding",
                        lambda x: (x + F.lit(0.01 * i)).cast("float")),
        ),
    ))
    mat("events", rep10(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        {"event_id": 10_000_000, "user_id": 1_000_000},
    ))
    mat("orders", rep10(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        {"o_orderkey": 100_000_000},
    ))
    mat("lineitem", rep10(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        {"l_orderkey": 100_000_000},
    ))
    for dim in ("customer", "supplier", "part", "nation", "region"):
        mat(dim, spark.read.parquet(f"{sf_dir}/{dim}.parquet"), parts=4)
    return tmp


def bench_sf1(spark, sf_dir: str) -> dict:
    """The full headline query set at sf1 (10x data): per-query wall and
    sf0.1->sf1 ratio, BOTH measured warm inside this section (the headline
    timings are first-execution numbers and include codegen/JIT — dividing
    warm sf1 by cold sf0.1 would understate every ratio ~2-5x). A ratio
    near 10 is linear; near 1 means the query's filter prunes to a fixed-
    size working set (scan_pushdown behavior — correct, not suspicious);
    >> 10 flags a super-linear term. Headline pipeline/CC scaling lives in
    scaling_10x (they use their own corpora)."""
    import shutil

    from gondar_spark.operators import dedup as dedup_ops

    t0 = time.time()
    tmp = build_sf1_dir(spark, sf_dir)
    build_s = round(time.time() - t0, 3)
    qs = entrymod.queries()
    out = {"corpus_build_s": build_s}
    try:
        for name in BENCH_QUERIES:
            dedup_ops.release_caches()
            spark.catalog.clearCache()
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            t_sf = round(time.time() - t0, 3)
            dedup_ops.release_caches()
            spark.catalog.clearCache()
            t0 = time.time()
            _force(qs[name](spark, tmp))
            t_sf1 = round(time.time() - t0, 3)
            out[name] = {
                "t_sf": t_sf,
                "t_sf1": t_sf1,
                "ratio": round(t_sf1 / t_sf, 2) if t_sf > 0 else None,
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_files = int(os.environ.get("GONDAR_BENCH_FILES", "48000"))
    only_extraction = os.environ.get("GONDAR_BENCH_ONLY") == "extraction"
    spark = build_session(
        app_name="gondar_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        arrow_batch_rows=int(os.environ.get("GONDAR_ARROW_ROWS", "512")),
        extra_conf={
            "spark.driver.memory": os.environ.get("GONDAR_DRIVER_MEM", "8g")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import gc

    timings: dict[str, float] = {}
    if not only_extraction:
        qs = entrymod.queries()
        # JIT/pagecache warm-up: touch every table once so the first
        # measured query isn't charged for session warm-up
        for t in ("documents", "embeddings", "events", "lineitem", "orders",
                  "customer", "supplier", "nation", "region", "part"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        from gondar_spark.operators import dedup as dedup_ops
        for name in BENCH_QUERIES:
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
            # operator-owned persists are released per query — the bench
            # session is the "long-lived session" ADVICE warned about —
            # and a driver-side gc keeps py4j handle churn out of the
            # next query's window
            dedup_ops.release_caches()
            gc.collect()

    extraction = bench_extraction(spark, n_files)
    timings["kg_extraction"] = extraction["sec"]

    scaling = None
    sf1 = None
    stage_walls: dict[str, float] = {}
    if not only_extraction:
        timings["kg_pipeline_full"], stage_walls = bench_full_pipeline(
            spark, return_stages=True)
        timings["kg_cc_100k"] = bench_cc(spark)
        if os.environ.get("GONDAR_BENCH_SCALING", "1") != "0":
            scaling = bench_scaling_10x(spark, sf_dir)
            # pipeline + CC data scaling (their own corpora, not sf tables):
            # 10x files through the full staged job; 10x edges through CC.
            # BOTH points re-measured here, warm — the headline values are
            # first-execution numbers (worker fork + JIT) and dividing a
            # warm 10x by a cold 1x understates the ratio.
            t1_pipe = bench_full_pipeline(spark, n_files=2_000)
            t10_pipe = bench_full_pipeline(spark, n_files=20_000)
            t1_cc = bench_cc(spark, n_edges=100_000)
            t10_cc = bench_cc(spark, n_edges=1_000_000)
            scaling["kg_pipeline_full"] = {
                "t_sf": t1_pipe, "t_10x": t10_pipe,
                "ratio": round(t10_pipe / t1_pipe, 2),
            }
            scaling["kg_cc_100k"] = {
                "t_sf": t1_cc, "t_10x": t10_cc,
                "ratio": round(t10_cc / t1_cc, 2),
            }
        if os.environ.get("GONDAR_BENCH_SF1", "1") != "0":
            sf1 = bench_sf1(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    payload = {
        "metric": "headline query wall-clock + KG extraction throughput",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extraction": extraction,
    }
    if stage_walls:
        payload["pipeline_stages"] = stage_walls
    # the scaling_10x / sf1 campaigns outgrew a single stdout line (the
    # driver's tail capture parses the LAST line only, and round 3's giant
    # combined line came back "parsed": null) — extras go to a FILE; stdout
    # stays exactly one compact JSON line, printed last.
    extras = {}
    if scaling is not None:
        extras["scaling_10x"] = scaling
    if sf1 is not None:
        extras["sf1"] = sf1
    if extras:
        out_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH")
        os.makedirs(out_dir, exist_ok=True)
        extras_path = os.path.join(out_dir, "extras_latest.json")
        with open(extras_path, "w") as f:
            json.dump(extras, f, indent=1)
        payload["extras_file"] = os.path.relpath(
            extras_path, os.path.dirname(os.path.abspath(__file__)))
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
