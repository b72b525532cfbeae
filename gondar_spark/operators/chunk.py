"""B3 document chunking — pure column ops, no UDF.

Analog of the reference's body sectioning + per-section loop
(get_Body /root/reference/gondar/tools/entrez.py:36-56; section loop
/root/reference/gondar/modules/PubMedFlow.py:233): content is split into
line-groups of ``chunk_lines`` so the extractor sees bounded inputs.
Chunking happens BEFORE the pandas-UDF stage so mega-files can't blow an
Arrow batch (SURVEY.md §7 "vectorized-UDF memory"); a hard char cap
truncates pathological single chunks.

Line-based grouping means a fact line never straddles chunks, mirroring
the reference's section boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_content(df: DataFrame, chunk_lines: int = 64,
                  max_chunk_chars: int = 1 << 20) -> DataFrame:
    """(.., content) -> (.., chunk_id:int, chunk:string), one row per chunk.

    All whole-stage-codegen: split -> grouped slices via
    transform(sequence(...)) -> posexplode. Empty/whitespace files yield
    zero chunks (empty-result semantics, A17 /
    /root/reference/gondar/modules/PubMedFlow.py:246).
    """
    lines = F.split(F.col("content"), "\n")
    n_lines = F.size(lines)
    n_chunks = F.ceil(n_lines / F.lit(chunk_lines)).cast("int")
    chunks = F.when(
        ~F.col("content").rlike(r"\S"), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.substring(
                F.array_join(
                    F.slice(lines, i * chunk_lines + 1, chunk_lines), "\n"
                ),
                1,
                max_chunk_chars,
            ),
        )
    )
    out_cols = [c for c in df.columns if c != "content"]
    return (
        df.withColumn("_chunks", chunks)
        .select(*out_cols, F.posexplode_outer("_chunks").alias("chunk_id", "chunk"))
        .filter(F.col("chunk").isNotNull())
    )
