"""URL canonicalization (llm/urls.py): engine kernel vs an
independent Python reference (urllib.parse + an explicit RFC 3986
segment stack), plus adversarial cases the synthetic corpus doesn't
cover ('..' past root, https:443, preserved non-default ports,
queryless URLs)."""

from __future__ import annotations

import os
import sys
from urllib.parse import urlsplit

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.llm.urls import (
    synthetic_urls,
    url_dedup,
    url_normalize,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

SF0001 = "/root/testdata/sf0.001"


def _normalize_py(url: str) -> str:
    p = urlsplit(url)
    scheme = p.scheme.lower()
    host = p.netloc.lower()
    for sch, port in (("http", ":80"), ("https", ":443")):
        if scheme == sch and host.endswith(port):
            host = host[: -len(port)]
    stack: list[str] = []
    for seg in p.path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if stack:
                stack.pop()
            continue
        stack.append(seg)
    path = "/" + "/".join(stack)
    query = "&".join(sorted(p.query.split("&"))) if p.query else ""
    return f"{scheme}://{host}{path}" + (f"?{query}" if query else "")


CASES = [
    "HTTP://WWW.Example.COM:80/a/skip/../docs/3?b=2&a=1",
    "http://www.example.com/a/./docs/3?a=1&b=2#sec3",
    "https://Host.Net:443/x/y/../../z",          # '..' chain to root
    "https://host.net:8443/keep/port?q=1",       # non-default port survives
    "http://h/../..",                             # '..' past root clamps
    "http://h/plain",                             # no query, no fragment
]


def test_engine_matches_independent_reference(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(CASES)], ["i", "url"])
    got = {r["i"]: r for r in url_normalize(df, "i").collect()}
    for i, u in enumerate(CASES):
        assert got[i]["norm_url"] == _normalize_py(u), u


def test_variant_pairs_collapse(spark):
    docs = load(spark, SF0001, "documents").select("doc_id")
    n = docs.count()
    out = url_dedup(synthetic_urls(docs, "doc_id"), "doc_id").collect()
    assert len(out) == (n + 1) // 2
    for r in out:
        k = int(r["norm_url"].rsplit("/", 1)[1].split("?")[0])
        expect_variants = 2 if 2 * k + 1 < n else 1
        assert r["n_variants"] == expect_variants, r
        assert r["keep_id"] == 2 * k
