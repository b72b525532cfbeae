from .spec import (  # noqa: F401
    LANGS,
    PREDICATES,
    extract_from_content,
    normalize_surface,
    char_ngrams,
    jaccard,
    minhash_signature,
    band_keys,
)
