"""Capture .explain("formatted") for bench queries into plans/r06/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" -> plans/r06/<query>_<suffix>.txt

Queries default to the bench set. The explain output is the ROUND
DELIVERABLE the judge checks plan claims against (OPTIMIZATION_r06.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="gondar_plans", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
