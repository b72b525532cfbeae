"""Physical-plan inspection helpers — the feedback loop for the scale
rules (SURVEY.md §4): filters must reach the scan, projections must prune,
the hot path must stay inside whole-stage codegen.

Used by tests to ASSERT plan shape, not just result values — a correct
result from a plan that scans every column is still a bug at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the formatted plan."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(", "))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read by each scan (column-pruning check)."""
    txt = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better.
    Formatted mode tags nodes with '[codegen id : N]'; simple mode uses
    '*(N)' prefixes — count distinct ids across both spellings."""
    conf = df.sparkSession.conf
    prev = conf.get("spark.sql.adaptive.enabled")
    try:
        # AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false) whose
        # codegen ids only exist after execution; plan once without it
        conf.set("spark.sql.adaptive.enabled", "false")
        txt = explain_str(df) + explain_str(df, "simple")
    finally:
        conf.set("spark.sql.adaptive.enabled", prev)
    ids = set(re.findall(r"codegen id : (\d+)", txt))
    ids |= set(re.findall(r"\*\((\d+)\)", txt))
    return len(ids)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)
