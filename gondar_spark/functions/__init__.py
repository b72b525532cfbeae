from .textstats import (  # noqa: F401
    with_token_count,
    with_quality_score,
    with_lang_scores,
    with_fingerprints,
)
