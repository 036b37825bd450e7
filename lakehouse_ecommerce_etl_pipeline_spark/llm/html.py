"""HTML → text extraction and boilerplate removal — the first stage
every web-scale training corpus runs (the C4/Gopher pipelines start
from WET/WARC text extraction; jusText/trafilatura-style paragraph
link-density pruning is the standard boilerplate cut).

The reference has no document corpus (see llm/pii.py for the same
situation); test pages are built deterministically around the
``documents`` table's text (closed form in doc_id ⇒ the oracle can
state GROUND TRUTH for what extraction must return), and the REAL
kernels run downstream with no knowledge of the construction:

- ``html_to_text``: drop <script>/<style> blocks (DOTALL non-greedy),
  strip remaining tags, unescape the common entity set (&amp; last so
  nothing double-unescapes), collapse whitespace;
- ``paragraph`` extraction + per-paragraph link counting: the
  jusText-lite decision — a paragraph containing anchor tags is
  boilerplate (nav/link farms), a link-free paragraph is content.

100 TB design
-------------
All regexp_replace/regexp_extract_all projections — per-row JVM work
inside whole-stage codegen, no shuffle, no UDF, linear in bytes
scanned. This is exactly the shape the scan already pays; extraction
rides it. Higher-order functions (transform/filter/aggregate) keep
the per-paragraph loop inside the row, never exploding it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# unescape order matters: &amp; LAST, so "&amp;lt;" → "&lt;" (one
# level, the HTML-correct result), never "<"
ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

_PARA_RE = "(?s)<p[^>]*>(.*?)</p>"
_LINK_RE = "<a [^>]*>"


def synthetic_pages(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap each document's text in a deterministic HTML page: head
    garbage (title/style/script), nav links, an <h1>, the text as a
    content paragraph, a link-farm paragraph, an entity-laden div and
    a footer (with one extra link when id % 3 == 0). Closed form in
    (doc_id, text) — SQL-reproducible ground truth."""
    i = F.col(id_col)
    page = F.concat(
        F.lit("<html><head><title>Doc "), i.cast("string"),
        F.lit("</title><style>p { margin: 0; }</style>"
              "<script>var id="), i.cast("string"),
        F.lit("; if (id &lt; 0) { id = 0; }</script></head><body>"
              '<nav><a href="/home">Home</a><a href="/about">About</a></nav>'
              "<h1>Doc "), i.cast("string"),
        F.lit("</h1><p>"), F.col(text_col),
        F.lit('</p><p class="links"><a href="/x">more</a> '
              '<a href="/y">links</a></p>'
              "<div>Tom &amp; Jerry &lt;3 &quot;quotes&quot; "
              "&#39;apos&#39; A&nbsp;B</div><footer>"),
        F.when(i % 3 == 0, F.lit('<a href="/f">feed</a> ')).otherwise(
            F.lit("")
        ),
        F.lit("id "), (i % 100).cast("string"),
        F.lit("</footer></body></html>"),
    )
    return df.select(i, page.alias("html"))


def _unescape(c: Column) -> Column:
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _collapse(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, "\\s+", " "))


def html_to_text(html: Column) -> Column:
    """Full-page text extraction: script/style blocks die wholesale
    (their content is not text), tags become spaces, entities
    unescape, whitespace collapses."""
    t = F.regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, "(?s)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, "<[^>]*>", " ")
    return _collapse(_unescape(t))


def extract_text(df: DataFrame, id_col: str, html_col: str = "html") -> DataFrame:
    t = html_to_text(F.col(html_col))
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.md5(t).alias("text_fp"),
    )


def boilerplate_stats(
    df: DataFrame, id_col: str, html_col: str = "html"
) -> DataFrame:
    """Page-level boilerplate signals: anchor/script/style/paragraph
    counts plus link density (anchors per extracted-text char) — the
    inputs a corpus-level page filter thresholds on."""
    h = F.col(html_col)
    t = html_to_text(h)
    n_links = F.size(F.regexp_extract_all(h, F.lit(_LINK_RE), F.lit(0)))
    return df.select(
        F.col(id_col),
        n_links.alias("n_links"),
        F.size(
            F.regexp_extract_all(h, F.lit("(?s)<script[^>]*>.*?</script>"), F.lit(0))
        ).alias("n_scripts"),
        F.size(
            F.regexp_extract_all(h, F.lit(_PARA_RE), F.lit(0))
        ).alias("n_paragraphs"),
        F.length(t).alias("text_len"),
        F.round(
            n_links.cast("double")
            / F.greatest(F.length(t), F.lit(1)).cast("double"),
            6,
        ).alias("link_density"),
    )


def main_text_col(html: Column) -> Column:
    """The jusText-lite extraction as a COLUMN: link-free <p> blocks'
    stripped text, joined — for pipelines that feed the extracted
    text to downstream gates (see plans/llm27.py)."""
    paras = F.regexp_extract_all(html, F.lit(_PARA_RE), F.lit(1))
    kept = F.filter(
        paras,
        lambda p: F.size(F.regexp_extract_all(p, F.lit(_LINK_RE), F.lit(0)))
        == 0,
    )
    texts = F.transform(
        kept, lambda p: _collapse(_unescape(F.regexp_replace(p, "<[^>]*>", " ")))
    )
    return _collapse(F.array_join(texts, " "))


def main_content(
    df: DataFrame, id_col: str, html_col: str = "html"
) -> DataFrame:
    """Paragraph-level boilerplate removal (jusText-lite): extract
    <p> blocks, keep only link-free paragraphs, join their stripped
    text. Link-bearing paragraphs are nav/link-farm boilerplate by
    the density heuristic's degenerate (and most common) case.

    The whole per-paragraph loop runs INSIDE the row via higher-order
    functions — no explode, no shuffle: at 100 TB the page stays put
    and only its extracted content survives the projection."""
    paras = F.regexp_extract_all(F.col(html_col), F.lit(_PARA_RE), F.lit(1))
    kept = F.filter(
        paras,
        lambda p: F.size(
            F.regexp_extract_all(p, F.lit(_LINK_RE), F.lit(0))
        )
        == 0,
    )
    texts = F.transform(
        kept, lambda p: _collapse(_unescape(F.regexp_replace(p, "<[^>]*>", " ")))
    )
    main = _collapse(F.array_join(texts, " "))
    return df.select(
        F.col(id_col),
        F.size(paras).alias("n_paragraphs"),
        F.size(kept).alias("n_kept"),
        F.length(main).alias("main_len"),
        F.md5(main).alias("main_fp"),
    )
