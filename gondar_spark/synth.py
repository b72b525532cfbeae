"""Deterministic synthetic corpus + golden fixtures (FIXTURES.md F1-F4).

The input table shape is mandated by /root/repo/BASELINE.json:15:
``(repo:string, path:string, commit:string, lang:string, content:string)``.
Content is rendered from the line grammar in ``extraction.spec`` — the
generator PLANTS facts and records them as golden triples, while the
pipeline's extractor independently re-parses the content, so triple P/R
against the golden fixture is a genuine measurement of the extractor
(analog of the reference's golden "satisfy" self-check,
/root/reference/gondar/modules/PubMedFlow.py:160-169).

Generation is keyed purely on (seed, file_id): the corpus DataFrame and
every golden DataFrame derive from the same pure function, so they are
reproducible on any cluster size and partitioning (determinism rule,
SURVEY.md §7). Distributed rendering goes through ``mapInPandas`` — no
driver-side materialization at bench scale.

Entity alias clusters (F4) are validated at build time against the
pipeline's own blocking + scoring functions, so the expected
connected-components output is known a priori: every cluster is connected
through LSH-candidate edges with Jaccard >= threshold, and no cross-cluster
pair reaches the threshold.
"""

from __future__ import annotations

import dataclasses
import hashlib
import itertools
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .extraction.spec import (
    LANG_SYNTAX,
    LANGS,
    band_keys,
    char_ngrams,
    jaccard,
    normalize_surface,
)

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("chunk_id", T.IntegerType(), False),
    ]
)

_SYLLABLES = [
    "par", "tok", "lex", "ner", "vec", "zum", "qua", "bel", "fro", "gim",
    "hax", "jol", "kep", "lum", "mor", "nix", "oqu", "pra", "rud", "sil",
    "tav", "urb", "vex", "wok", "yal", "zeb", "cro", "dap", "fen", "gly",
]
_WORDS2 = ["tree", "graph", "node", "edge", "span", "rule", "sink", "pool"]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs"}
_IMPORT_TARGETS = {
    "python": ["core.utils", "net.http", "data.io", "sys.meta"],
    "java": ["core.utils", "net.http", "data.io", "sys.meta"],
    "go": ["core/utils", "net/http", "data/io", "sys/meta"],
    "js": ["core/utils", "net/http", "data/io", "sys/meta"],
    "rust": ["core::utils", "net::http", "data::io", "sys::meta"],
}


@dataclasses.dataclass(frozen=True)
class SynthConfig:
    n_files: int = 200
    seed: int = 42
    n_entities: int = 24
    chunk_lines: int = 64
    hot_entity_weight: float = 0.12  # fraction of facts drawn from cluster 0
    facts_min: int = 3               # facts per file (bench harness raises
    facts_max: int = 12              # these to make extraction CPU-bound)
    mega_file_prob: float = 0.005    # heavy-tail huge files (Arrow-batch tests)
    empty_file_prob: float = 0.01    # empty/whitespace content rows
    minhash_hashes: int = 16
    lsh_bands: int = 8
    link_threshold: float = 0.60
    link_seed: int = 1001


@dataclasses.dataclass(frozen=True)
class EntityCluster:
    idx: int
    words: tuple[str, ...]
    variants: tuple[str, ...]   # surface forms usable as symbols
    literal: str | None         # spaced Title form for log("...") mentions

    @property
    def norms(self) -> set[str]:
        out = {normalize_surface(v) for v in self.variants}
        if self.literal:
            out.add(normalize_surface(self.literal))
        return out


def _camel(words: tuple[str, ...]) -> str:
    return "".join(w.capitalize() for w in words)


def _make_variants(words: tuple[str, ...], singleton: bool) -> tuple[tuple[str, ...], str | None]:
    if singleton:
        return (_camel(words),), None
    variants = (
        _camel(words),                      # ParTree
        "_".join(words),                    # par_tree
        "".join(words),                     # partree
        "_".join(words) + "_impl",          # par_tree_impl
    )
    literal = " ".join(w.capitalize() for w in words)  # "Par Tree"
    return variants, literal


def _cluster_connected(cluster: EntityCluster, cfg: SynthConfig) -> bool:
    """Check the cluster is connected via the pipeline's OWN blocking +
    scoring functions (LSH band-key overlap AND Jaccard >= threshold)."""
    norms = sorted(cluster.norms)
    if len(norms) == 1:
        return True
    adj = {n: set() for n in norms}
    keys = {
        n: set(band_keys(n, cfg.minhash_hashes, cfg.lsh_bands, cfg.link_seed))
        for n in norms
    }
    grams = {n: char_ngrams(n) for n in norms}
    for a, b in itertools.combinations(norms, 2):
        if keys[a] & keys[b] and jaccard(grams[a], grams[b]) >= cfg.link_threshold:
            adj[a].add(b)
            adj[b].add(a)
    seen = {norms[0]}
    stack = [norms[0]]
    while stack:
        for nb in adj[stack.pop()]:
            if nb not in seen:
                seen.add(nb)
                stack.append(nb)
    return len(seen) == len(norms)


def _cross_cluster_safe(a: EntityCluster, b: EntityCluster, cfg: SynthConfig) -> bool:
    margin = cfg.link_threshold - 0.05
    for na in a.norms:
        for nb in b.norms:
            if jaccard(char_ngrams(na), char_ngrams(nb)) >= margin:
                return False
    return True


def build_entity_pool(cfg: SynthConfig) -> list[EntityCluster]:
    """Deterministic, self-validating alias-cluster pool. Every third
    cluster is a singleton (no-merge test, FIXTURES.md F4)."""
    rng = random.Random(cfg.seed * 7919 + 13)
    pool: list[EntityCluster] = []
    attempts = 0
    while len(pool) < cfg.n_entities:
        attempts += 1
        if attempts > cfg.n_entities * 60:
            raise RuntimeError("entity pool generation failed to converge")
        words = (rng.choice(_SYLLABLES) + rng.choice(_SYLLABLES), rng.choice(_WORDS2))
        singleton = (len(pool) % 3) == 2
        variants, literal = _make_variants(words, singleton)
        cand = EntityCluster(len(pool), words, variants, literal)
        if not _cluster_connected(cand, cfg):
            continue
        if any(not _cross_cluster_safe(cand, p, cfg) for p in pool):
            continue
        pool.append(cand)
    return pool


# --------------------------------------------------------------------------
# per-file rendering (pure function of (cfg, pool, file_id))
# --------------------------------------------------------------------------

_FILLER_WORDS = ["todo", "refactor", "legacy", "benchmark", "cache", "wip"]


def render_file(cfg: SynthConfig, pool: list[EntityCluster], file_id: int):
    """Return (row_dict, facts) where facts = [(pred, obj, kind, line_no)].

    Deterministic in (cfg.seed, file_id) only — safe to call from any
    partition on any executor.
    """
    rng = random.Random((cfg.seed << 20) ^ file_id)
    n_repos = max(4, cfg.n_files // 40)
    u = rng.random()
    repo = f"org{int(n_repos * u * u) % n_repos}/repo"  # quadratic skew -> mega-repos
    lang = rng.choice(LANGS)
    path = f"src/{rng.choice(_FILLER_WORDS)}/mod_{file_id}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{cfg.seed}:{repo}:{path}".encode()).hexdigest()

    roll = rng.random()
    if roll < cfg.empty_file_prob:
        content = "" if rng.random() < 0.5 else "   \n  \n"
        return {"repo": repo, "path": path, "commit": commit, "lang": lang,
                "content": content}, []

    syn = LANG_SYNTAX[lang]
    n_facts = rng.randint(cfg.facts_min, cfg.facts_max)
    if roll < cfg.empty_file_prob + cfg.mega_file_prob:
        n_facts = rng.randint(400, 800)  # heavy tail: chunking/Arrow stress

    def pick_cluster() -> EntityCluster:
        if rng.random() < cfg.hot_entity_weight:
            return pool[0]  # hot entity: skew-handling test target
        return pool[rng.randrange(len(pool))]

    lines: list[str] = []
    facts: list[tuple[str, str, str, int]] = []
    seen: set[tuple[str, str]] = set()
    for _ in range(n_facts):
        # filler prefix: comments / blanks the extractor must ignore
        for _f in range(rng.randint(0, 2)):
            lines.append(
                syn["comment"].format(words=" ".join(
                    rng.choice(_FILLER_WORDS) for _ in range(3)))
                if rng.random() < 0.7 else ""
            )
        cl = pick_cluster()
        kind_roll = rng.random()
        if kind_roll < 0.30:
            pred, tpl, kind = "defines_fn", syn["fn"], "symbol"
            obj = rng.choice(cl.variants)
            line = tpl.format(name=obj)
        elif kind_roll < 0.50:
            pred, tpl, kind = "defines_type", syn["ty"], "symbol"
            obj = rng.choice(cl.variants)
            line = tpl.format(name=obj)
        elif kind_roll < 0.65:
            pred, tpl, kind = "imports", syn["imp"], "module"
            obj = rng.choice(_IMPORT_TARGETS[lang])
            line = tpl.format(target=obj)
        elif kind_roll < 0.82:
            pred, tpl, kind = "calls", syn["call"], "symbol"
            obj = rng.choice(cl.variants)
            line = tpl.format(name=obj)
        elif kind_roll < 0.94:
            pred, tpl, kind = "mentions", syn["lit"], "literal"
            obj = cl.literal or cl.variants[0]
            line = tpl.format(mention=obj)
        else:
            # A8 analog: structured attribute as auxiliary mention source
            pred, tpl, kind = "has_attr", syn["attr"], "literal"
            obj = cl.literal or cl.variants[0]
            line = tpl.format(value=obj)
        if (pred, obj) in seen:
            continue
        seen.add((pred, obj))
        facts.append((pred, obj, kind, len(lines)))
        lines.append(line)
    content = "\n".join(lines)
    return {"repo": repo, "path": path, "commit": commit, "lang": lang,
            "content": content}, facts


# --------------------------------------------------------------------------
# distributed generation (mapInPandas over spark.range — no driver data)
# --------------------------------------------------------------------------

def _id_range_df(spark: SparkSession, cfg: SynthConfig, partitions: int) -> DataFrame:
    return spark.range(0, cfg.n_files, 1, partitions)


def generate_source_df(
    spark: SparkSession, cfg: SynthConfig, partitions: int = 32
) -> DataFrame:
    pool = build_entity_pool(cfg)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [render_file(cfg, pool, int(i))[0] for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in SOURCE_SCHEMA])

    return _id_range_df(spark, cfg, partitions).mapInPandas(gen, SOURCE_SCHEMA)


def golden_triples_df(
    spark: SparkSession, cfg: SynthConfig, partitions: int = 32
) -> DataFrame:
    """Planted facts as (subj, pred, obj, kind, provenance, chunk_id) —
    the P/R oracle (FIXTURES.md F2). subj is the file entity."""
    pool = build_entity_pool(cfg)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                row, facts = render_file(cfg, pool, int(i))
                subj = f"{row['repo']}:{row['path']}"
                for pred, obj, kind, line_no in facts:
                    out.append(
                        (subj, pred, obj, kind, row["repo"], row["path"],
                         row["commit"], line_no // cfg.chunk_lines)
                    )
            yield pd.DataFrame(out, columns=[f.name for f in TRIPLE_SCHEMA])

    return _id_range_df(spark, cfg, partitions).mapInPandas(gen, TRIPLE_SCHEMA)


def golden_hashes_df(
    spark: SparkSession, cfg: SynthConfig, partitions: int = 32
) -> DataFrame:
    """(repo, path, commit, content_sha256) — per-row source invariant
    (FIXTURES.md F3; /root/repo/BASELINE.json:15)."""
    pool = build_entity_pool(cfg)
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), False),
            T.StructField("content_sha256", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                row, _ = render_file(cfg, pool, int(i))
                rows.append(
                    (row["repo"], row["path"], row["commit"],
                     hashlib.sha256(row["content"].encode()).hexdigest())
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return _id_range_df(spark, cfg, partitions).mapInPandas(gen, schema)


def expected_entity_of(surface: str, pool: list[EntityCluster]) -> int | None:
    """Cluster index a mention surface belongs to, by the generator's
    own knowledge (used to build golden entity/alias tables in tests)."""
    norm = normalize_surface(surface)
    for cl in pool:
        if norm in cl.norms:
            return cl.idx
    return None
