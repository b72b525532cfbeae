"""As-of join and banded range join: boundary semantics (inclusive <=,
window-edge exclusivity, equal-ts ordering, no-match behavior) on
hand-built fixtures where the right answer is enumerable."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gondar_spark.operators.asof import asof_join, range_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_join_picks_latest_at_or_before(spark):
    probes = spark.createDataFrame(
        [("u1", _ts(30), "p1"), ("u1", _ts(5), "p2"), ("u2", _ts(30), "p3"),
         ("u3", _ts(30), "p4")],  # u3 has no build rows at all
        ["k", "ts", "pid"],
    )
    build = spark.createDataFrame(
        [("u1", _ts(10), 100), ("u1", _ts(30), 200), ("u1", _ts(40), 300),
         ("u2", _ts(31), 400)],  # u2's only row is AFTER the probe
        ["k", "ts", "val"],
    )
    out = {r["pid"]: r["asof_val"]
           for r in asof_join(probes, build, "k", "ts", ["val"]).collect()}
    assert out == {"p1": 200}  # equal ts matches (inclusive); 300 is later
    # p2: no build row at/before 10:05; p3: build only after; p4: no rows
    outer = asof_join(probes, build, "k", "ts", ["val"], inner=False)
    assert outer.count() == 4
    assert outer.filter(F.col("asof_val").isNull()).count() == 3


def test_asof_join_scales_without_blowup(spark):
    """Plan shape: one window over the union — no join at all, so no
    per-key cartesian regardless of build-side density."""
    probes = spark.range(10).select(
        F.lit("k").alias("k"),
        F.timestamp_seconds(F.col("id") * 60 + 1_700_000_000).alias("ts"),
        F.col("id").alias("pid"),
    )
    build = spark.range(1000).select(
        F.lit("k").alias("k"),
        F.timestamp_seconds(F.col("id") * 6 + 1_700_000_000).alias("ts"),
        F.col("id").alias("val"),
    )
    out = asof_join(probes, build, "k", "ts", ["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, never a join operator
    rows = {r["pid"]: r["asof_val"] for r in out.collect()}
    # probe at minute m (ts = m*60) matches build id m*10 (ts equal)
    assert rows == {m: m * 10 for m in range(10)}


def test_asof_join_keeps_match_with_null_payload(spark):
    """A genuine match whose payload value is NULL must survive the inner
    filter (match-existence is the struct, not its first field) — the
    semantics DuckDB's native ASOF JOIN has."""
    probes = spark.createDataFrame([("u1", _ts(30), "p1")], ["k", "ts", "pid"])
    build = spark.createDataFrame(
        [("u1", _ts(10), None)], "k string, ts timestamp, val int"
    )
    out = asof_join(probes, build, "k", "ts", ["val"]).collect()
    assert len(out) == 1 and out[0]["asof_val"] is None


def test_range_join_window_boundaries(spark):
    probes = spark.createDataFrame(
        [("u1", _ts(30), "p1")], ["k", "ts", "pid"]
    )
    build = spark.createDataFrame(
        [
            ("u1", dt.datetime(2024, 1, 1, 9, 30), 1),    # exactly -1h: EXCLUDED
            ("u1", dt.datetime(2024, 1, 1, 9, 30, 1), 2),  # just inside
            ("u1", _ts(30), 3),                            # equal ts: included
            ("u1", dt.datetime(2024, 1, 1, 10, 30, 1), 4),  # after: excluded
            ("u2", _ts(29), 5),                            # other key
        ],
        ["k", "ts", "bid"],
    )
    got = sorted(
        r["bid_b"]
        for r in range_join(probes, build, "k", "ts", 3600).collect()
    )
    assert got == [2, 3]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    """Rows near bucket edges must appear exactly once (the probe checks
    two buckets; a build row lives in exactly one)."""
    probes = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 11, 0, 30), i) for i in range(3)],
        ["k", "ts", "pid"],
    )
    build = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 10, 59, 59), 1),
         ("k", dt.datetime(2024, 1, 1, 11, 0, 0), 2)],
        ["k", "ts", "bid"],
    )
    out = range_join(probes, build, "k", "ts", 3600)
    per_pair = out.groupBy("pid", "bid_b").count().filter(F.col("count") > 1)
    assert per_pair.count() == 0
    assert out.count() == 6  # every probe sees both build rows once


def test_asof_join_bucketed_parity_random_and_hotkey(spark):
    """asof_join_bucketed == asof_join on (a) a mixed fixture and (b) a
    hot-key fixture where ONE key carries 50% of all rows — the case the
    plain per-key window funnels through a single task."""
    from gondar_spark.operators.asof import asof_join_bucketed

    base = 1_700_000_000
    # deterministic pseudo-random-ish fixture: 6 keys, scattered ts
    probes = spark.range(600).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 5).cast("string")))
        .alias("k"),
        F.timestamp_seconds(base + (F.col("id") * 97) % 50_000).alias("ts"),
        F.col("id").alias("pid"),
    )
    build = spark.range(400).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 5).cast("string")))
        .alias("k"),
        F.timestamp_seconds(base + (F.col("id") * 131) % 50_000).alias("ts"),
        F.col("id").alias("val"),
    )
    for inner in (True, False):
        a = asof_join(probes, build, "k", "ts", ["val"], inner=inner)
        b = asof_join_bucketed(
            probes, build, "k", "ts", ["val"],
            bucket_width_s=600, inner=inner,
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        assert a.count() == b.count()


def test_asof_join_bucketed_carry_across_empty_buckets(spark):
    """A probe whose bucket (and several preceding buckets) contain no
    build rows must still match the last build row far earlier."""
    from gondar_spark.operators.asof import asof_join_bucketed

    base = 1_700_000_000
    probes = spark.createDataFrame(
        [("k", base + 10_000, "late_probe")], ["k", "epoch", "pid"]
    ).select("k", F.timestamp_seconds("epoch").alias("ts"), "pid")
    build = spark.createDataFrame(
        [("k", base + 5, 42)], ["k", "epoch", "val"]
    ).select("k", F.timestamp_seconds("epoch").alias("ts"), "val")
    out = asof_join_bucketed(
        probes, build, "k", "ts", ["val"], bucket_width_s=60
    ).collect()
    assert len(out) == 1 and out[0]["asof_val"] == 42


def test_asof_join_bucketed_equal_ts_inclusive(spark):
    """Build row at exactly the probe ts matches (inclusive), same as
    asof_join / DuckDB ASOF JOIN — including at a bucket boundary."""
    from gondar_spark.operators.asof import asof_join_bucketed

    base = 1_700_000_000
    width = 60
    boundary = base - base % width + width  # exact bucket edge
    probes = spark.createDataFrame(
        [("k", boundary, "p")], ["k", "epoch", "pid"]
    ).select("k", F.timestamp_seconds("epoch").alias("ts"), "pid")
    build = spark.createDataFrame(
        [("k", boundary, 7), ("k", boundary - 1, 6)], ["k", "epoch", "val"]
    ).select("k", F.timestamp_seconds("epoch").alias("ts"), "val")
    out = asof_join_bucketed(
        probes, build, "k", "ts", ["val"], bucket_width_s=width
    ).collect()
    assert len(out) == 1 and out[0]["asof_val"] == 7
