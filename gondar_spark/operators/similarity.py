"""Similarity search over embedding columns (array<float>).

  * cosine_topk        — exact brute-force top-k against a query vector:
                         JVM-side zip_with/aggregate dot product, then a
                         global top-k (orderBy+limit — Spark runs it as
                         TakeOrderedAndProject, no full sort at scale).
  * cosine_topk_per_probe — batch variant: top-k neighbors for EVERY probe
                         row via broadcast join + row_number window.
  * ivf_topk           — IVF-style ANN: k-means-free deterministic
                         centroid assignment (hash-seeded sample centroids),
                         probe only the nearest n_probe cells. The
                         scale path: the candidate set shrinks by the
                         cell fan-out instead of scanning everything.
  * embedding_near_dup — cosine >= threshold pairs via cell-blocked join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector (the baseline)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        round_half_up(cosine_col(v, q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def cosine_topk_per_probe(
    data: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors for every probe row: broadcast the (small) probe
    set against the big side, score JVM-side, take per-probe top-k with a
    row_number window (partial top-k per partition under AQE)."""
    d = data.select(
        F.col(id_col).alias("data_id"),
        F.col(vec_col).cast("array<double>").alias("dv"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
    )
    scored = d.join(F.broadcast(p), F.col("data_id") != F.col("probe_id")).select(
        "probe_id",
        "data_id",
        round_half_up(cosine_col(F.col("dv"), F.col("pv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("data_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """IVF cell assignment: nearest (by cosine) of the literal centroid
    list; n_probe > 1 replicates rows into their top-n cells (recall knob).
    Centroids are data-derived but passed as literals — at 100 TB they come
    from a driver-side sample (tiny) and broadcast as part of the plan."""
    v = F.col(vec_col).cast("array<double>")
    scored = F.array(
        *[
            F.struct(
                round_half_up(
                    cosine_col(v, F.array(*[F.lit(float(x)) for x in c])), 6
                ).alias("sim"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.array_sort(scored, lambda a, b: F.when(a["sim"] > b["sim"], -1)
                               .when(a["sim"] < b["sim"], 1)
                               .otherwise(a["cell"] - b["cell"])), 1, n_probe)
    return df.withColumn("_cells", top).select(
        "*", F.explode(F.col("_cells.cell")).alias("cell")
    ).drop("_cells")


def ivf_topk(
    data: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: scan only the n_probe cells nearest to the query.

    Probe selection rounds to 6 decimals with the same half-up formula as
    assign_cells / the DuckDB oracle, so the probed cell set is identical
    across engines (unrounded doubles could order two near-equal cells
    differently)."""
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        raw = dot / (na * nb) if na and nb else 0.0
        return math.floor(raw * 1e6 + 0.5) / 1e6

    order = sorted(
        range(len(centroids)),
        key=lambda i: (-cos(query_vec, centroids[i]), i),
    )
    probe_cells = order[:n_probe]
    celled = assign_cells(data, centroids, vec_col, n_probe=1)
    cand = celled.filter(F.col("cell").isin(probe_cells))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def quantize_int8_error(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Linear int8 (0..255) per-vector quantization + reconstruction
    error — the storage-compression step of a large-scale embedding
    pipeline (4x smaller vectors before ANN indexing).

    Per vector: scale = (max-min)/255, code = floor((x-min)/scale + 0.5),
    dequant = min + code*scale, error = max |x - dequant|. Every
    operation is per-element double arithmetic and the reduction is MAX
    (order-independent), so the DuckDB oracle matches bit-for-bit — no
    summation-order hazard. Constant vectors (scale 0) quantize to code 0
    with zero error.
    """
    v = F.col(vec_col).cast("array<double>")
    mn = F.array_min(v)
    mx = F.array_max(v)
    scale = (mx - mn) / 255.0
    staged = df.select(
        F.col(id_col), v.alias("_v"), mn.alias("_mn"), scale.alias("_sc")
    )
    code = F.transform(
        F.col("_v"),
        lambda x: F.when(F.col("_sc") == 0.0, F.lit(0).cast("bigint"))
        .otherwise(F.floor((x - F.col("_mn")) / F.col("_sc") + 0.5)),
    )
    with_code = staged.select(id_col, "_v", "_mn", "_sc", code.alias("_q"))
    err = F.array_max(
        F.zip_with(
            F.col("_v"),
            F.col("_q"),
            lambda x, b: F.abs(x - (F.col("_mn") + b * F.col("_sc"))),
        )
    )
    return with_code.select(
        id_col,
        F.size(F.array_distinct("_q")).cast("int").alias("n_levels"),
        round_half_up(err, 6).alias("max_abs_err"),
    )


def embedding_near_dup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
) -> DataFrame:
    """Near-duplicate embedding pairs: block by IVF cell (each row lands
    in its n_probe nearest cells so borderline pairs meet in some cell),
    then exact cosine within cells."""
    celled = assign_cells(df, centroids, vec_col, n_probe=n_probe).select(
        "cell",
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    a = celled.withColumnsRenamed({"id": "id_a", "v": "v_a"})
    b = celled.withColumnsRenamed({"id": "id_b", "v": "v_b"})
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            round_half_up(cosine_col(F.col("v_a"), F.col("v_b")), 6).alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cosine") >= threshold)
    )
