"""XML-shaped ingestion (A4-A8 over real XML via xpath): metadata
projection, body sectioning with the table-wrap anti-projection
(entrez.py:45-47 — table content must NOT leak into body text), and
attribute stripping (entrez.py:59-68)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gondar_spark.operators.xml_ops import (
    strip_attrs,
    with_article_xml,
    xml_body_sections,
    xml_meta,
    xml_tables,
)


def _docs(spark):
    rows = [
        (0, "en", "web", "alpha beta gamma delta epsilon zeta eta theta iota"),
        (1, "de", None, "eins zwei drei vier fuenf sechs sieben acht neun"),
        (2, "en", "book", "one, two. three four five six seven eight nine ten"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])


def test_meta_projection_and_null_safe_join(spark):
    out = {r["doc_id"]: r for r in xml_meta(with_article_xml(_docs(spark))).collect()}
    assert out[0]["title"] == "Doc 0"
    assert out[0]["journal"] == "web"
    assert out[0]["doi"] == "10.5555/0"
    assert out[0]["epub_year"] == "2000"
    assert out[0]["meta_line"] == "Doc 0 | web | 10.5555/0"
    # A5 null-safety: missing journal -> '?', never a crash or a drop
    assert out[1]["journal"] == ""
    assert out[1]["meta_line"] == "Doc 1 | ? | 10.5555/1"


def test_body_sections_exclude_table_content(spark):
    """The anti-projection: table-wrap text never appears in sections,
    and the three sections reassemble the cleaned source text."""
    df = with_article_xml(_docs(spark))
    secs = xml_body_sections(df).collect()
    assert all("cells" not in r["section"] for r in secs)
    by_doc: dict[int, list] = {}
    for r in secs:
        by_doc.setdefault(r["doc_id"], []).append((r["sec_idx"], r["section"]))
    joined = "".join(s for _, s in sorted(by_doc[0]))
    assert joined.replace(" ", "") == (
        "alpha beta gamma delta epsilon zeta eta theta iota".replace(" ", "")
    )
    tables = xml_tables(df).collect()
    assert {r["table_content"] for r in tables} == {"cells 0", "cells 1", "cells 2"}


def test_strip_attrs_removes_all_attributes(spark):
    df = with_article_xml(_docs(spark)).select(
        strip_attrs(F.col("article_xml")).alias("x")
    )
    x = df.first()["x"]
    assert 'id="' not in x and 'pub-id-type="' not in x and 'lang="' not in x
    # structure survives: tags still present and xpath still parses
    assert "<sec>" in x and "<table-wrap>" in x
    n = df.select(F.size(F.xpath(F.col("x"), F.lit("//body/sec/text()"))).alias("n"))
    assert n.first()["n"] == 3


def test_hostile_source_values_stay_well_formed(spark):
    """A source value containing &, < or \" must not produce malformed XML
    (malformed XML makes every xpath on the row silently return empty —
    the divergence ADVICE r2 flagged)."""
    from pyspark.sql import functions as F

    from gondar_spark.operators.xml_ops import with_article_xml, xml_meta

    docs = spark.createDataFrame(
        [(1, "en", 'Jour & <nal> "Q"', "some body text here for sections ok")],
        ["doc_id", "lang", "source", "text"],
    )
    out = xml_meta(with_article_xml(docs)).collect()[0]
    assert out["title"] == "Doc 1"          # xpath worked: XML well-formed
    assert out["journal"] == "Jour  nal Q"  # markup chars stripped, not kept
    assert out["doi"] == "10.5555/1"
