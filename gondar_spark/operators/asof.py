"""As-of join (point-in-time lookup): for each probe row, the most recent
build-side row with the same key and time <= probe time.

Spark has no native as-of join; the naive theta-join
(p.key = b.key AND b.ts <= p.ts, then max) explodes to O(|p| x |b|) per
key. The scalable pattern used here is UNION + single window pass:

    tag both sides -> union -> one sort per key on (ts, side) ->
    last(build_payload, ignorenulls) over rows-unbounded-preceding

One shuffle on the key (the same co-partitioning a sort-merge join would
pay), zero row blow-up, and whole-stage codegen throughout. Build rows
sort BEFORE probe rows at equal timestamps, so the match is inclusive
(build.ts <= probe.ts) — the same semantics as DuckDB's native
ASOF JOIN, which serves as the oracle (__spark_entry__.asof_event_lookup).

At 100 TB: both sides shuffle once on the key. SKEW HONESTY: AQE's skew
handling splits JOIN partitions, not WINDOW partitions — a mega-key in
``Window.partitionBy(key)`` funnels through ONE task here. When a key can
dominate the input, use ``asof_join_bucketed``: it splits the per-key
window into (key, time-bucket) windows plus a carry-in computed on the
tiny per-bucket summary — identical semantics, straggler cost bounded by
rows-per-bucket instead of rows-per-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    build: DataFrame,
    key: str,
    time_col: str,
    build_payload: list[str],
    inner: bool = True,
) -> DataFrame:
    """probes(key, ts, ...) x build(key, ts, payload...) ->
    probes + matched payload struct columns (prefixed 'asof_').

    The build side should be unique per (key, ts) — pre-dedupe if not —
    otherwise which equal-ts row wins is engine-defined.
    """
    p = probes.withColumn("_side", F.lit(1)).withColumn(
        "_bp", F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {dict(build.dtypes)[c]}" for c in build_payload
            ) + ">"
        )
    )
    b = build.select(
        key,
        time_col,
        F.lit(0).alias("_side"),
        F.struct(*build_payload).alias("_bp"),
    )
    # align: probes keep all their columns; build contributes only
    # (key, ts, payload)
    probe_cols = [c for c in probes.columns]
    b_aligned = b.select(
        *[
            F.lit(None).cast(dict(probes.dtypes)[c]).alias(c)
            if c not in (key, time_col) else F.col(c)
            for c in probe_cols
        ],
        "_side",
        "_bp",
    )
    unioned = p.select(*probe_cols, "_side", "_bp").unionByName(b_aligned)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("_match", F.last("_bp", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_side", "_bp")
    )
    if inner:
        # match-existence = the STRUCT being non-null — a genuine match
        # whose first payload value happens to be NULL must be kept
        # (DuckDB's native ASOF JOIN keeps it)
        matched = matched.filter(F.col("_match").isNotNull())
    return matched.select(
        *probe_cols,
        *[F.col(f"_match.{c}").alias(f"asof_{c}") for c in build_payload],
    )


def asof_join_bucketed(
    probes: DataFrame,
    build: DataFrame,
    key: str,
    time_col: str,
    build_payload: list[str],
    bucket_width_s: int = 3600,
    inner: bool = True,
) -> DataFrame:
    """Skew-resistant as-of join — same semantics as :func:`asof_join`,
    parallel-prefix execution:

      1. window per (key, TIME-BUCKET): running last-build within each
         bucket (a hot key spreads over its buckets — the straggler task
         shrinks from |key| rows to |key| / n_buckets);
      2. per-(key, bucket) summary (one row each — tiny): the bucket's
         last build payload;
      3. carry-in per bucket = last non-null summary over all EARLIER
         buckets (window over the summary table: one row per bucket per
         key, so the hot key's window is cheap);
      4. join the carry-in back on (key, bucket);
         match = coalesce(local running last, carry-in).

    Equal timestamps land in the same bucket, and build-before-probe
    ordering inside a bucket matches asof_join, so results are identical
    (parity-tested, including a 50%-hot-key fixture).
    """
    bkt = F.floor(F.unix_timestamp(F.col(time_col)) / bucket_width_s)
    p = probes.withColumn("_side", F.lit(1)).withColumn(
        "_bp", F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {dict(build.dtypes)[c]}" for c in build_payload
            ) + ">"
        )
    )
    b = build.select(
        key,
        time_col,
        F.lit(0).alias("_side"),
        F.struct(*build_payload).alias("_bp"),
    )
    probe_cols = list(probes.columns)
    b_aligned = b.select(
        *[
            F.lit(None).cast(dict(probes.dtypes)[c]).alias(c)
            if c not in (key, time_col) else F.col(c)
            for c in probe_cols
        ],
        "_side",
        "_bp",
    )
    unioned = (
        p.select(*probe_cols, "_side", "_bp")
        .unionByName(b_aligned)
        .withColumn("_bkt", bkt)
    )
    w_local = (
        Window.partitionBy(key, "_bkt")
        .orderBy(F.col(time_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = unioned.withColumn(
        "_local", F.last("_bp", ignorenulls=True).over(w_local)
    )
    # last build row per (key, bucket) — max of struct(ts, payload) over
    # build rows only (build unique per (key, ts): the asof_join
    # precondition, so the struct max is the ts max, deterministic)
    summary = unioned.groupBy(key, "_bkt").agg(
        F.max(
            F.when(F.col("_side") == 0,
                   F.struct(F.col(time_col).alias("_ts"), F.col("_bp")))
        )["_bp"].alias("_blast")
    )
    w_carry = (
        Window.partitionBy(key)
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summary.withColumn(
        "_carry", F.last("_blast", ignorenulls=True).over(w_carry)
    ).select(key, "_bkt", "_carry")
    matched = (
        local.join(carry, [key, "_bkt"], "left")
        .filter(F.col("_side") == 1)
        .withColumn("_match", F.coalesce(F.col("_local"), F.col("_carry")))
    )
    if inner:
        matched = matched.filter(F.col("_match").isNotNull())
    return matched.select(
        *probe_cols,
        *[F.col(f"_match.{c}").alias(f"asof_{c}") for c in build_payload],
    )


def range_join(
    probes: DataFrame,
    build: DataFrame,
    key: str,
    time_col: str,
    window_s: int,
) -> DataFrame:
    """Interval join: all (probe, build) pairs with the same key and
    build.ts in (probe.ts - window_s, probe.ts].

    The naive inequality join is a per-key cartesian; this buckets both
    sides into window_s-wide time buckets and equi-joins each probe
    against its OWN bucket and the one before (any in-window build row
    must land in one of the two), then applies the exact range filter.
    Join fan-out is bounded by rows-per-bucket, not rows-per-key —
    the standard banded interval-join at scale.

    Output: probe columns + build columns suffixed '_b'.
    """
    pb = probes.withColumn(
        "_pbkt", F.floor(F.unix_timestamp(time_col) / window_s).cast("long")
    ).withColumn("_bkt", F.explode(F.array(F.col("_pbkt"), F.col("_pbkt") - 1)))
    bb = build.select(
        F.col(key).alias("_bkey"),
        F.col(time_col).alias("_bts"),
        *[
            F.col(c).alias(f"{c}_b")
            for c in build.columns
            if c not in (key, time_col)
        ],
    ).withColumn(
        "_bkt", F.floor(F.unix_timestamp("_bts") / window_s).cast("long")
    )
    joined = pb.join(
        bb,
        (F.col(key) == F.col("_bkey")) & (pb["_bkt"] == bb["_bkt"]),
    )
    in_range = joined.filter(
        (F.col("_bts") > F.col(time_col) - F.expr(f"INTERVAL {window_s} SECOND"))
        & (F.col("_bts") <= F.col(time_col))
    )
    return in_range.drop("_pbkt", "_bkt", "_bkey")
