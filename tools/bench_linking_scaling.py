"""Linking-stage N-vs-4N point (round-5 verdict ask #5's addendum: the
lifecycle stages are the new hot path and never had a two-parallelism
measurement). Runs ONE ingest_at_scale campaign per parallelism level in
a fresh JVM subprocess (taskset-pinned like tools/bench_scaling.py) and
reports the incremental link wall at both.

Usage: python tools/bench_linking_scaling.py [families] [batch] [small] [big]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import json, sys
sys.path.insert(0, {repo!r})
import os
from gondar_spark.session import build_session
from tools.bench_linking import ingest_at_scale
spark = build_session(app_name="linkscale",
                      master="local[" + os.environ["SPARK_GRAFT_CPUS"] + "]",
                      shuffle_partitions=32,
                      extra_conf={{"spark.driver.memory": "16g"}})
spark.sparkContext.setLogLevel("ERROR")
print("RESULT:" + json.dumps(ingest_at_scale(spark, {families}, {batch})))
spark.stop()
"""


def run_once(cpus: int, families: int, batch: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
           _DRIVER.format(repo=REPO, families=families, batch=batch)]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=3600)
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("RESULT:")][-1]
    return json.loads(line[len("RESULT:"):])


def main() -> None:
    families = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500
    small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    big = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    rs = run_once(small, families, batch)
    rb = run_once(big, families, batch)
    print(json.dumps({
        "families": families, "batch_families": batch,
        f"local[{small}]": {
            "link_wall_s": rs["link_wall_s"],
            "link_stage_walls_s": rs["link_stage_walls_s"],
            "ingest_run_wall_s": rs["ingest_run_wall_s"]},
        f"local[{big}]": {
            "link_wall_s": rb["link_wall_s"],
            "link_stage_walls_s": rb["link_stage_walls_s"],
            "ingest_run_wall_s": rb["ingest_run_wall_s"]},
        "link_wall_speedup_4x_cores": round(
            rs["link_wall_s"] / rb["link_wall_s"], 2)
        if rb["link_wall_s"] else None,
    }))


if __name__ == "__main__":
    main()
