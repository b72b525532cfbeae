"""XML-shaped ingestion — the A4-A8 operators over REAL XML, closing the
last semantic distance to the reference's article parsing
(get_Meta /root/reference/gondar/tools/entrez.py:21-33; get_Body :36-56
with the table-wrap anti-projection :45-47; removeAllAttrs :59-68;
get_Tables :71-85).

Spark-side parsing uses the built-in xpath Hive UDFs (JVM-side, no
Python): ``F.xpath_string`` for scalar metadata, ``F.xpath`` for the
section/table arrays. Attribute stripping (A7 — the reference's
token-minimizing rewrite) is one regexp_replace.

The synthetic article XML is CONSTRUCTED from the documents table with
deterministic string concat in both engines, so the DuckDB oracle can
re-extract every field with regexes — the two engines agree only if the
xpath semantics (element text, table-wrap exclusion, attr handling) are
implemented correctly; construction is shared shape, parsing is the
operator under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean(col):
    """XML-safe text: strip markup-significant chars identically in both
    engines (documents.text is synthetic prose, this is belt-and-braces)."""
    return F.regexp_replace(col, "[^a-zA-Z0-9 .,]", "")


def with_article_xml(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source, text) -> + article_xml.

    Shape mirrors the reference's PubMed article: front matter
    (article-title, journal-title, doi article-id, epub pub-date), a body
    of three <sec> elements (first third / middle / last third of the
    text), and a trailing <table-wrap> whose content must NOT leak into
    body sections (entrez.py:45-47). Elements carry attributes so the A7
    strip is observable.
    """
    t = _clean(F.col("text"))
    n = F.length(t)
    third = F.floor(n / 3).cast("int")
    sec1 = t.substr(F.lit(1), third)
    sec2 = t.substr(third + 1, third)
    sec3 = t.substr(third * 2 + 1, n - third * 2)
    return docs.withColumn(
        "article_xml",
        F.concat(
            F.lit('<article article-type="research"><front>'),
            # lang/source interpolate into markup, so they pass through the
            # same _clean as text — a raw '&', '<' or '"' in a source value
            # would otherwise produce malformed XML that silently nulls
            # every xpath on the row (the oracle mirrors this transform)
            F.lit('<article-title lang="'), _clean(F.col("lang")), F.lit('">'),
            F.lit("Doc "), F.col("doc_id").cast("string"),
            F.lit("</article-title>"),
            F.lit("<journal-title>"),
            F.coalesce(_clean(F.col("source")), F.lit("")),
            F.lit("</journal-title>"),
            F.lit('<article-id pub-id-type="doi">10.5555/'),
            F.col("doc_id").cast("string"), F.lit("</article-id>"),
            F.lit('<pub-date pub-type="epub"><year>20'),
            F.lpad((F.col("doc_id") % 30).cast("string"), 2, "0"),
            F.lit("</year></pub-date></front>"),
            F.lit('<body><sec id="s1">'), sec1, F.lit("</sec>"),
            F.lit('<sec id="s2">'), sec2, F.lit("</sec>"),
            F.lit('<sec id="s3">'), sec3, F.lit("</sec>"),
            F.lit('<table-wrap id="t1"><table>cells '),
            F.col("doc_id").cast("string"),
            F.lit("</table></table-wrap></body></article>"),
        ),
    )


def strip_attrs(xml_col) -> "F.Column":
    """A7: recursive attribute strip as one JVM regex pass —
    '<tag a="b" ...>' -> '<tag>' (the reference clears attrs to save
    tokens before the expensive operator; entrez.py:59-68)."""
    return F.regexp_replace(xml_col, r"<(\w[\w-]*)\s+[^>]*>", "<$1>")


def xml_meta(df: DataFrame, xml_col: str = "article_xml") -> DataFrame:
    """A4/A5: scalar metadata projection via xpath + null-safe concat."""
    x = F.col(xml_col)
    title = F.xpath_string(x, F.lit("//article-title"))
    journal = F.xpath_string(x, F.lit("//journal-title"))
    doi = F.xpath_string(x, F.lit('//article-id[@pub-id-type="doi"]'))
    year = F.xpath_string(x, F.lit('//pub-date[@pub-type="epub"]/year'))
    return df.select(
        "doc_id",
        title.alias("title"),
        journal.alias("journal"),
        doi.alias("doi"),
        year.alias("epub_year"),
        F.concat_ws(
            " | ", title, F.coalesce(F.nullif(journal, F.lit("")), F.lit("?")),
            doi,
        ).alias("meta_line"),
    )


def xml_body_sections(df: DataFrame, xml_col: str = "article_xml") -> DataFrame:
    """A6: body sections exploded one-per-row, attr-stripped first,
    whitespace-normalized — and table-wrap content EXCLUDED (the
    anti-projection): xpath selects only <sec> text."""
    stripped = strip_attrs(F.col(xml_col))
    secs = F.xpath(stripped, F.lit("//body/sec/text()"))
    return (
        df.select("doc_id", F.posexplode(secs).alias("sec_idx", "sec_raw"))
        .select(
            "doc_id",
            F.col("sec_idx").cast("int").alias("sec_idx"),
            F.regexp_replace(F.trim(F.col("sec_raw")), r"\s+", " ")
            .alias("section"),
        )
        .filter(F.length("section") > 0)
    )


def xml_tables(df: DataFrame, xml_col: str = "article_xml") -> DataFrame:
    """A8: table extraction as an auxiliary source, attrs stripped."""
    stripped = strip_attrs(F.col(xml_col))
    tables = F.xpath(stripped, F.lit("//table-wrap/table/text()"))
    return df.select(
        "doc_id", F.explode(tables).alias("table_content")
    )
