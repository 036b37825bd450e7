"""URL canonicalization + URL-level dedup — the crawl-side key every
web corpus dedups on before any content ever downloads.

RFC 3986 normalization, the subset that matters for dedup keys:
scheme/host case-folding, default-port stripping (:80 for http, :443
for https), dot-segment removal in the path (``.`` dropped, ``..``
pops), query-parameter ordering, fragment removal. Two raw URLs that
differ only in these dimensions identify the same resource; a corpus
that doesn't canonicalize fetches and stores them twice.

Everything is a narrow projection: regexp_extract parsing, an
``aggregate`` fold over path segments for the dot-segment stack (the
one genuinely sequential part — it stays INSIDE the row as a
higher-order function, no explode), array_sort for query params.
Zero UDFs, zero shuffles until the dedup groupBy — which then runs on
the canonical key, exactly once per resource.

Test corpus: deterministic raw URLs from doc_id (llm/urls.synthetic
construction, closed form ⇒ ground-truth oracles) where consecutive
id pairs (2k, 2k+1) denormalize the SAME resource two different ways
— case, default port, dot segments, param order, fragment — so the
dedup rollup must collapse them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def synthetic_urls(df: DataFrame, id_col: str) -> DataFrame:
    """(id, url): ids 2k and 2k+1 spell the same resource differently
    — upper-case scheme/host + :80 + a ``x/..`` path detour + swapped
    query params on the even side; a ``.`` segment + a fragment on
    the odd side. Canonical form for both:
    ``http://www.example.com/a/docs/<k>?a=1&b=2``."""
    i = F.col(id_col)
    k = F.floor(i / 2).cast("string")
    even = F.concat(
        F.lit("HTTP://WWW.Example.COM:80/a/skip/../docs/"), k, F.lit("?b=2&a=1")
    )
    odd = F.concat(
        F.lit("http://www.example.com/a/./docs/"), k, F.lit("?a=1&b=2#sec"), k
    )
    return df.select(i, F.when(i % 2 == 0, even).otherwise(odd).alias("url"))


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 as an in-row fold: '.' is dropped, '..' pops
    the segment stack. array accumulator, no explode."""
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            s == "..",
            F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
        )
        .when(s == ".", acc)
        .otherwise(F.concat(acc, F.array(s))),
    )
    return F.concat(F.lit("/"), F.array_join(stack, "/"))


def normalize_url(url: Column) -> dict[str, Column]:
    """Decompose + canonicalize; returns the parts and the rebuilt
    canonical URL. Fragments never survive (they are client-side)."""
    scheme = F.lower(F.regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring_index(hostport, ":", 1),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring_index(hostport, ":", 1),
    ).otherwise(hostport)
    raw_path = F.regexp_extract(
        url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = _remove_dot_segments(raw_path)
    query = F.regexp_extract(url, "\\?([^#]*)", 1)
    sorted_query = F.array_join(
        F.array_sort(F.split(query, "&")), "&"
    )
    norm = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query != "", F.concat(F.lit("?"), sorted_query)).otherwise(
            F.lit("")
        ),
    )
    return {
        "scheme": scheme,
        "host": host,
        "path": path,
        "query": sorted_query,
        "norm_url": norm,
    }


def url_normalize(df: DataFrame, id_col: str, url_col: str = "url") -> DataFrame:
    parts = normalize_url(F.col(url_col))
    return df.select(
        F.col(id_col),
        parts["scheme"].alias("scheme"),
        parts["host"].alias("host"),
        parts["path"].alias("path"),
        parts["query"].alias("query"),
        parts["norm_url"].alias("norm_url"),
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str = "url") -> DataFrame:
    """Canonical-key dedup: one row per RESOURCE with the variant
    count and the kept (smallest-id) fetch — the decision that stops
    a crawler storing the same page twice. The groupBy shuffles only
    (norm_url, id): canonicalization happened map-side."""
    parts = normalize_url(F.col(url_col))
    return (
        df.select(F.col(id_col), parts["norm_url"].alias("norm_url"))
        .groupBy("norm_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.min(id_col).alias("keep_id"),
        )
    )
