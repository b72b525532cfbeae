"""The extraction contract: a pure, deterministic, seedable extractor.

The reference's extraction operator is an LLM pinned to determinism
(temperature 0.0, seed 1001, JSON mode —
/root/reference/gondar/modules/PubMedFlow.py:71-72,104) with a prompt-level
contract (PubMedFlow.py:159-173):

  * values are VERBATIM spans of the source text (:168),
  * no empty / "Not specified" values (:170),
  * one mention per row (:171),
  * fixed column count / schema (:172),
  * no newlines inside values (:173).

We reproduce that contract with a pure function over ``content`` — the
"LLM extractor" the north star wraps (/root/repo/BASELINE.json:6). Both
the Spark pipeline (inside mapInPandas) and the golden-fixture validation
import THIS module, so the contract lives in exactly one place.

Also here: the similarity primitives (normalization, char n-grams,
Jaccard, md5-based MinHash/LSH band keys). The md5 construction is chosen
so the distributed Spark-SQL implementation and the DuckDB oracle compute
the *identical* strings — hex md5 is order-preserving under lexicographic
min, so ``min(md5(...))`` agrees across engines.
"""

from __future__ import annotations

import hashlib
import re

LANGS = ("python", "java", "go", "js", "rust")

# predicate vocabulary — plays the role of the reference's typed "heads"
# (/root/reference/gondar/modules/PubMedFlow.py:213-218); the parenthesized
# head type (Named Entity / Values-Unit / Brief) becomes `kind`.
# `has_attr` is the A8 analog: structured attribute blocks extracted as an
# auxiliary mention source (reference: table-wrap collection,
# /root/reference/gondar/tools/entrez.py:71-85).
PREDICATES = ("defines_fn", "defines_type", "imports", "calls", "mentions",
              "has_attr")

# --------------------------------------------------------------------------
# line grammar (shared by the synthetic generator) and extraction regexes
# --------------------------------------------------------------------------

LANG_SYNTAX: dict[str, dict[str, str]] = {
    "python": {
        "fn": "def {name}(ctx):",
        "ty": "class {name}:",
        "imp": "import {target}",
        "call": "    out = {name}(ctx)",
        "lit": '    log("{mention}")',
        "attr": 'OWNER = "{value}"',
        "comment": "# {words}",
    },
    "java": {
        "fn": "public static Result {name}(Context ctx) {{",
        "ty": "class {name} {{",
        "imp": "import {target};",
        "call": "        Result out = {name}(ctx);",
        "lit": '        log("{mention}");',
        "attr": 'static final String OWNER = "{value}";',
        "comment": "// {words}",
    },
    "go": {
        "fn": "func {name}(ctx Context) Result {{",
        "ty": "type {name} struct {{",
        "imp": 'import "{target}"',
        "call": "\tout := {name}(ctx)",
        "lit": '\tlog("{mention}")',
        "attr": 'const OWNER = "{value}"',
        "comment": "// {words}",
    },
    "js": {
        "fn": "function {name}(ctx) {{",
        "ty": "class {name} {{",
        "imp": "import '{target}'",
        "call": "  const out = {name}(ctx)",
        "lit": '  log("{mention}")',
        "attr": 'const OWNER = "{value}"',
        "comment": "// {words}",
    },
    "rust": {
        "fn": "fn {name}(ctx: Context) -> Result {{",
        "ty": "struct {name} {{",
        "imp": "use {target};",
        "call": "    let out = {name}(ctx);",
        "lit": '    log("{mention}");',
        "attr": 'const OWNER: &str = "{value}";',
        "comment": "// {words}",
    },
}

# one regex table per lang; each pattern captures the verbatim span.
_RULES: dict[str, list[tuple[str, str, re.Pattern]]] = {
    "python": [
        ("defines_fn", "symbol", re.compile(r"^def (\w+)\(")),
        ("defines_type", "symbol", re.compile(r"^class (\w+):")),
        ("imports", "module", re.compile(r"^import ([\w.]+)$")),
        ("has_attr", "literal", re.compile(r'^OWNER = "([^"\n]+)"$')),
    ],
    "java": [
        ("defines_fn", "symbol", re.compile(r"^public static \w+ (\w+)\(")),
        ("defines_type", "symbol", re.compile(r"^class (\w+) \{")),
        ("imports", "module", re.compile(r"^import ([\w.]+);$")),
        ("has_attr", "literal",
         re.compile(r'^static final String OWNER = "([^"\n]+)";$')),
    ],
    "go": [
        ("defines_fn", "symbol", re.compile(r"^func (\w+)\(")),
        ("defines_type", "symbol", re.compile(r"^type (\w+) struct \{")),
        ("imports", "module", re.compile(r'^import "([\w/.]+)"$')),
        ("has_attr", "literal", re.compile(r'^const OWNER = "([^"\n]+)"$')),
    ],
    "js": [
        ("defines_fn", "symbol", re.compile(r"^function (\w+)\(")),
        ("defines_type", "symbol", re.compile(r"^class (\w+) \{")),
        ("imports", "module", re.compile(r"^import '([\w/.]+)'$")),
        ("has_attr", "literal", re.compile(r'^const OWNER = "([^"\n]+)"$')),
    ],
    "rust": [
        ("defines_fn", "symbol", re.compile(r"^fn (\w+)\(")),
        ("defines_type", "symbol", re.compile(r"^struct (\w+) \{")),
        ("imports", "module", re.compile(r"^use ([\w:]+);$")),
        ("has_attr", "literal",
         re.compile(r'^const OWNER: &str = "([^"\n]+)";$')),
    ],
}
# lang-independent rules: assignment-call and string-literal mention
_CALL_RE = re.compile(r"(?:=|:=)\s*(\w+)\(")
_LIT_RE = re.compile(r'log\("([^"\n]+)"\)')

# hot-loop dispatch: every anchored rule implies a literal line prefix, so
# a startswith() check (C-speed) gates each regex attempt — filler lines
# (comments/blanks, the majority) never touch the regex engine.
_PREFIX: dict[tuple[str, str], str] = {
    ("python", "defines_fn"): "def ",
    ("python", "defines_type"): "class ",
    ("python", "imports"): "import ",
    ("python", "has_attr"): "OWNER",
    ("java", "defines_fn"): "public static ",
    ("java", "defines_type"): "class ",
    ("java", "imports"): "import ",
    ("java", "has_attr"): "static final ",
    ("go", "defines_fn"): "func ",
    ("go", "defines_type"): "type ",
    ("go", "imports"): "import ",
    ("go", "has_attr"): "const ",
    ("js", "defines_fn"): "function ",
    ("js", "defines_type"): "class ",
    ("js", "imports"): "import ",
    ("js", "has_attr"): "const ",
    ("rust", "defines_fn"): "fn ",
    ("rust", "defines_type"): "struct ",
    ("rust", "imports"): "use ",
    ("rust", "has_attr"): "const ",
}
_DISPATCH: dict[str, list[tuple[str, str, str, re.Pattern]]] = {
    lang: [
        (_PREFIX[(lang, pred)], pred, kind, pat)
        for pred, kind, pat in rules
    ]
    for lang, rules in _RULES.items()
}


def extract_from_content(
    lang: str, content: str
) -> list[tuple[str, str, str, int]]:
    """Extract (pred, obj, kind, line_no) facts from one file's content.

    Deterministic, order = line order. Honors the verbatim contract: every
    ``obj`` is a character-for-character span of ``content`` with no
    newlines; empty spans are never emitted (PubMedFlow.py:168,170,173).
    """
    rules = _DISPATCH.get(lang, _DISPATCH["python"])
    out: list[tuple[str, str, str, int]] = []
    for i, line in enumerate(content.split("\n")):
        if not line:
            continue
        matched = False
        for prefix, pred, kind, pat in rules:
            if line.startswith(prefix):
                m = pat.match(line)
                if m and m.group(1):
                    out.append((pred, m.group(1), kind, i))
                    matched = True
                    break
        if matched:
            continue
        if '"' in line and "log(" in line:
            m = _LIT_RE.search(line)
            if m:
                out.append(("mentions", m.group(1), "literal", i))
                continue
        if "(" in line and ("=" in line or ":=" in line):
            m = _CALL_RE.search(line)
            if m and m.group(1) != "log":
                out.append(("calls", m.group(1), "symbol", i))
    return out


def poison_extractor(lang: str, content: str) -> list[tuple[str, str, str, int]]:
    """Fault-injection extractor: raises on any unit containing 'POISON',
    otherwise delegates to the spec extractor. Lives in the package (not
    the tests) so Spark workers can unpickle it by reference — used to
    exercise the retry/quarantine path (A15) with a *real* failure."""
    if "POISON" in content:
        raise ValueError("poisoned unit")
    return extract_from_content(lang, content)


# --------------------------------------------------------------------------
# similarity primitives (linking stages B5-B8)
# --------------------------------------------------------------------------

_NORM_RE = re.compile(r"[^a-z0-9]+")


def normalize_surface(s: str) -> str:
    """B5 mention normalization: lowercase + drop non-alphanumerics.

    Chosen so CamelCase / snake_case / spaced variants of one entity
    collapse toward the same normal form (ParseTree, parse_tree,
    "Parse Tree" -> parsetree). Mirrors the Spark-side
    ``lower`` + ``regexp_replace`` exactly.
    """
    return _NORM_RE.sub("", s.lower())


def char_ngrams(s: str, n: int = 3) -> set[str]:
    """Distinct character n-grams; short strings contribute themselves."""
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _h(seed: int, k: int, shingle: str) -> str:
    """The shared hash: hex md5 of 'seed:k:shingle'. Same expression is
    computed JVM-side as md5(concat(...)) and in DuckDB — identical hex
    strings, identical lexicographic min."""
    return hashlib.md5(f"{seed}:{k}:{shingle}".encode()).hexdigest()


def minhash_signature(
    norm: str, n_hashes: int = 16, seed: int = 1001, ngram: int = 3
) -> list[str]:
    grams = sorted(char_ngrams(norm, ngram))
    if not grams:
        grams = [""]
    return [min(_h(seed, k, g) for g in grams) for k in range(n_hashes)]


def band_keys(
    norm: str,
    n_hashes: int = 16,
    bands: int = 8,
    seed: int = 1001,
    ngram: int = 3,
) -> list[str]:
    """LSH band keys: md5 over the '|'-joined rows of each band."""
    sig = minhash_signature(norm, n_hashes, seed, ngram)
    rows = n_hashes // bands
    keys = []
    for b in range(bands):
        payload = "|".join(sig[b * rows : (b + 1) * rows])
        keys.append(f"{b}:" + hashlib.md5(payload.encode()).hexdigest())
    return keys
