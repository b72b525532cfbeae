"""Generate the committed KG-oracle fixture: a single deterministic parquet
file of synthetic source rows (repo, path, commit, lang, content) that BOTH
engines read — Spark runs the real extraction/linking operators over it,
and the DuckDB oracle re-derives the same triples/edges/entities in SQL
(see __spark_entry__.py kg_* oracle entries).

Single-file parquet via pyarrow (not a Spark directory write) so the
oracle's read_parquet() sees one stable file; rows sorted by (repo, path)
for reproducible bytes-independent content.

Usage: python tools/make_kg_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gondar_spark.synth import SynthConfig, build_entity_pool, render_file  # noqa: E402

N_FILES = 80
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "kg_source.parquet")


def main() -> None:
    cfg = SynthConfig(n_files=N_FILES)
    pool = build_entity_pool(cfg)
    rows = [render_file(cfg, pool, i)[0] for i in range(N_FILES)]
    rows.sort(key=lambda r: (r["repo"], r["path"]))
    table = pa.table(
        {k: [r[k] for r in rows] for k in ("repo", "path", "commit", "lang", "content")}
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {N_FILES} rows -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
