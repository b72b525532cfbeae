"""B4: the vectorized mention-detection + triple-extraction stage.

This is the ONE custom pandas-UDF stage of the pipeline (SURVEY.md §2B),
the analog of the reference's per-section LLM loop fused with its JSON
parse, empty filter, and tabulation (A14/A16/A17/A18/A19 —
/root/reference/gondar/modules/PubMedFlow.py:233-251). Differences by
design:

  * partition-parallel ``mapInPandas`` over Arrow micro-batches instead of
    a sequential driver loop — the extractor is invoked once per batch
    ("no per-row Python", /root/repo/BASELINE.json:15);
  * deterministic extractor (extraction.spec) replaces the LLM pinned to
    temperature 0 / seed 1001 (PubMedFlow.py:72,104);
  * bounded in-UDF retry with quarantine rows instead of silent drops
    (A15 — PubMedFlow.py:74-75); Spark task retry handles machine faults;
  * one mention per output row, fixed schema (the prompt contract,
    PubMedFlow.py:171-172).

Output rows carry full provenance; batch-level metrics (rows in/out,
errors) are emitted as `__metric__` rows and split off by the pipeline
into the lineage table (A20 analog — PubMedFlow.py:242, Flow.py:27-40).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..extraction.spec import extract_from_content

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("chunk_id", T.IntegerType(), False),
    ]
)

_COLS = [f.name for f in EXTRACT_SCHEMA]


def _extract_micro_batch(pdf: pd.DataFrame, max_retries: int) -> list[tuple]:
    """One extractor invocation per micro-batch (the batched 'LLM call')."""
    out: list[tuple] = []
    for repo, path, commit, lang, chunk_id, chunk in zip(
        pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"],
        pdf["chunk_id"], pdf["chunk"]
    ):
        subj = f"{repo}:{path}"
        attempt = 0
        while True:
            try:
                facts = extract_from_content(lang, chunk)
                break
            except Exception as e:  # quarantine, never silently drop (A15)
                attempt += 1
                if attempt > max_retries:
                    out.append((subj, "__error__", str(e)[:500], "error",
                                repo, path, commit, lang, int(chunk_id)))
                    facts = []
                    break
        for pred, obj, kind, _line in facts:
            out.append((subj, pred, obj, kind, repo, path, commit, lang,
                        int(chunk_id)))
    return out


def extract_triples(chunked: DataFrame, max_retries: int = 2,
                    emit_metrics: bool = True) -> DataFrame:
    """chunked(repo,path,commit,lang,chunk_id,chunk) -> triple rows.

    Column-prunes its own input (only the 6 needed columns cross the
    Arrow boundary — the reference's token-minimization instinct,
    /root/reference/gondar/tools/entrez.py:59-68, as input narrowing).
    """
    narrow = chunked.select("repo", "path", "commit", "lang", "chunk_id", "chunk")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = _extract_micro_batch(pdf, max_retries)
            if emit_metrics:
                rows.append(
                    ("__batch__", "__metric__",
                     f"chunks_in={len(pdf)};triples_out={len(rows)}",
                     "metric", "", "", "", "", -1)
                )
            yield pd.DataFrame(rows, columns=_COLS)

    return narrow.mapInPandas(run, EXTRACT_SCHEMA)


def split_extraction(raw: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(triples, quarantine, metrics) — quarantine/metrics feed lineage."""
    triples = raw.filter(~raw.pred.isin("__error__", "__metric__"))
    quarantine = raw.filter(raw.pred == "__error__")
    metrics = raw.filter(raw.pred == "__metric__")
    return triples, quarantine, metrics
