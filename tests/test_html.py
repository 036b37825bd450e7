"""HTML tier (llm/html.py): the engine's regex-chain extraction is
checked against a genuinely independent extractor — Python's
event-driven html.parser walking the DOM-ish token stream (no regexes
at all) — plus structural checks on the boilerplate decision."""

from __future__ import annotations

import hashlib
import os
import re
import sys
from html.parser import HTMLParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from lakehouse_ecommerce_etl_pipeline_spark.llm.html import (
    boilerplate_stats,
    extract_text,
    main_content,
    synthetic_pages,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

SF0001 = "/root/testdata/sf0.001"


class _TextExtractor(HTMLParser):
    """Independent reference: event-driven parse, skipping script and
    style content. convert_charrefs resolves entities the HTML way
    (&nbsp; → U+00A0, which the kernel maps to a plain space)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1
        self.chunks.append(" ")

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self._skip -= 1
        self.chunks.append(" ")

    def handle_data(self, data):
        if not self._skip:
            self.chunks.append(data)


def _extract_py(html: str) -> str:
    p = _TextExtractor()
    p.feed(html)
    text = "".join(p.chunks).replace("\xa0", " ")
    return re.sub(r"\s+", " ", text).strip()


@pytest.fixture(scope="module")
def pages(spark):
    docs = load(spark, SF0001, "documents").select("doc_id", "text")
    return synthetic_pages(docs, "doc_id", "text")


def test_extraction_matches_independent_parser(spark, pages):
    raw = {r["doc_id"]: r["html"] for r in pages.collect()}
    got = {r["doc_id"]: r for r in extract_text(pages, "doc_id").collect()}
    assert len(got) == len(raw)
    for d, html in raw.items():
        expect = _extract_py(html)
        assert got[d]["text_fp"] == hashlib.md5(expect.encode()).hexdigest(), d
        assert got[d]["n_chars"] == len(expect)


def test_main_content_keeps_exactly_the_document_text(spark, pages):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF0001, "documents").select("doc_id", "text").collect()
    }
    got = {r["doc_id"]: r for r in main_content(pages, "doc_id").collect()}
    for d, text in docs.items():
        clean = re.sub(r"\s+", " ", text).strip()
        r = got[d]
        assert r["n_paragraphs"] == 2
        assert r["n_kept"] == 1  # the link-farm paragraph died
        assert r["main_fp"] == hashlib.md5(clean.encode()).hexdigest(), d
        assert r["main_len"] == len(clean)


def test_boilerplate_counts_match_page_structure(spark, pages):
    got = {r["doc_id"]: r for r in boilerplate_stats(pages, "doc_id").collect()}
    for d, r in got.items():
        assert r["n_links"] == 4 + (1 if d % 3 == 0 else 0)
        assert r["n_scripts"] == 1
        assert r["n_paragraphs"] == 2
        assert r["text_len"] > 0
        assert r["link_density"] == round(r["n_links"] / r["text_len"], 6)
