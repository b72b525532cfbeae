"""Worker-picklable test doubles for the extraction seams.

These live in the PACKAGE (not tests/) because mapInPandas deserializes
them inside Spark worker processes, where the tests directory is not
importable. No production code path imports this module.
"""

from __future__ import annotations


class CountingBatchExtractor:
    """Counts expensive-operator invocations from the DRIVER side: appends
    one line (the batch size) per ``extract_batch`` call to a shared file
    — O_APPEND is atomic for small writes in local mode, and transport
    counters held in worker memory are invisible to the driver. Used to
    assert the triples_raw stage extracts each unit exactly ONCE
    (tests/test_advice_fixes.py)."""

    def __init__(self, marker_path: str) -> None:
        self.marker_path = marker_path

    def extract_batch(self, rows):
        from .spec import extract_from_content

        with open(self.marker_path, "a") as f:
            f.write(f"{len(rows)}\n")
        return [extract_from_content(lang, unit)
                for lang, unit, _subj, _chunk in rows]
