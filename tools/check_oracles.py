"""Local mimic of the driver's correctness gate: run every queries() entry
via Spark and its oracle_sql() via DuckDB on the same sf dir; compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]

Set GONDAR_ORACLES_JSON=<path> to additionally append one JSON record
{"sf_dir", "results": {query: "pass"|"rows-only"|"fail: ..."}} per run.
The per-round artifact is built by sweeping all three SFs into one file:

    for sf in 0.001 0.01 0.1; do
      GONDAR_ORACLES_JSON=ORACLES_r03.json \
        python tools/check_oracles.py /root/testdata/sf$sf
    done
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from gondar_spark.session import build_session  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6g}")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            elif isinstance(v, list):
                vals.append(str(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = build_session(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    results: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            from gondar_spark.operators.dedup import release_caches
            release_caches()
            spark.catalog.clearCache()  # operator-owned persists: see
            # gondar_spark/operators/dedup.py cache-ownership note
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            results[name] = f"fail: spark error {str(e)[:120]}"
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows-only ({len(srows)} rows)")
            results[name] = f"rows-only ({len(srows)} rows)"
            n_weak += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols_raw = rel.columns
            drows = [dict(zip(dcols_raw, r)) for r in rel.fetchall()]
            dcols = sorted(dcols_raw)
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            results[name] = f"fail: duckdb error {str(e)[:120]}"
            n_fail += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            results[name] = f"fail: columns {scols} vs {dcols}"
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            results[name] = f"fail: rowcount {len(srows)} vs {len(drows)}"
            n_fail += 1
            continue
        sc = canon([r.asDict() for r in srows], scols)
        dc = canon(drows, dcols)
        if sc != dc:
            bad = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            results[name] = "fail: value mismatch"
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        results[name] = f"pass ({len(srows)} rows)"
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_weak} rows-only, {n_fail} FAIL ==")
    out_path = os.environ.get("GONDAR_ORACLES_JSON")
    if out_path:
        import json

        with open(out_path, "a") as f:
            f.write(json.dumps({"sf_dir": sf_dir, "n_pass": n_pass,
                                "n_rows_only": n_weak, "n_fail": n_fail,
                                "results": results}) + "\n")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
