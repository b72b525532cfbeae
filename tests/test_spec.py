"""Unit tests for the pure extraction/similarity spec (no Spark)."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from gondar_spark.extraction.spec import (
    LANGS,
    band_keys,
    char_ngrams,
    extract_from_content,
    jaccard,
    minhash_signature,
    normalize_surface,
)
from gondar_spark.synth import SynthConfig, build_entity_pool, render_file


def test_extractor_roundtrips_planted_facts():
    cfg = SynthConfig(n_files=200)
    pool = build_entity_pool(cfg)
    total = 0
    for fid in range(200):
        row, facts = render_file(cfg, pool, fid)
        assert extract_from_content(row["lang"], row["content"]) == facts
        total += len(facts)
    assert total > 500


def test_verbatim_contract():
    """Every extracted obj is a verbatim, newline-free span of content
    (PubMedFlow.py:168,170,173 contract)."""
    cfg = SynthConfig(n_files=50)
    pool = build_entity_pool(cfg)
    for fid in range(50):
        row, _ = render_file(cfg, pool, fid)
        for _pred, obj, _kind, _line in extract_from_content(
            row["lang"], row["content"]
        ):
            assert obj and "\n" not in obj
            assert obj in row["content"]


def test_empty_content_yields_nothing():
    for lang in LANGS:
        assert extract_from_content(lang, "") == []
        assert extract_from_content(lang, "   \n  \n") == []


def test_normalize_surface():
    assert normalize_surface("ParseTree") == "parsetree"
    assert normalize_surface("parse_tree") == "parsetree"
    assert normalize_surface("Parse Tree") == "parsetree"
    assert normalize_surface("__") == ""


def test_char_ngrams_and_jaccard():
    assert char_ngrams("abcd") == {"abc", "bcd"}
    assert char_ngrams("ab") == {"ab"}
    assert char_ngrams("") == set()
    assert jaccard({"a", "b"}, {"a", "b"}) == 1.0
    assert jaccard({"a"}, {"b"}) == 0.0
    assert jaccard(set(), set()) == 1.0


def test_minhash_matches_manual_md5():
    sig = minhash_signature("abc", n_hashes=2, seed=7)
    want = [hashlib.md5(f"7:{k}:abc".encode()).hexdigest() for k in range(2)]
    assert sig == want  # single shingle -> min is that shingle's hash


def test_band_keys_deterministic_and_shaped():
    k1 = band_keys("parsetree")
    k2 = band_keys("parsetree")
    assert k1 == k2 and len(k1) == 8
    assert all(k.split(":")[0] == str(i) for i, k in enumerate(k1))


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=40))
@settings(max_examples=100, deadline=None)
def test_normalize_idempotent(s):
    n = normalize_surface(s)
    assert normalize_surface(n) == n


def test_entity_pool_validated():
    cfg = SynthConfig()
    pool = build_entity_pool(cfg)
    assert len(pool) == cfg.n_entities
    # singletons every third cluster
    assert all(len(pool[i].variants) == 1 for i in range(2, len(pool), 3))
    # cross-cluster norms never collide
    seen = {}
    for cl in pool:
        for n in cl.norms:
            assert n not in seen, f"norm {n} in clusters {seen[n]} and {cl.idx}"
            seen[n] = cl.idx
