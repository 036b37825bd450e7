"""q_dup_span_removal kernel parity vs an independent pure-Python
reference (naive k-gram multiplicity + positional excision — no
hashing shortcuts, no Spark expressions)."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans.llm28 import _K, shingle_hashes


def _norm_tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]


def _reference_removal(docs: dict[int, str], k: int) -> dict[int, tuple]:
    """Naive O(total^2)-ish reference: collect every k-gram (as the
    literal token tuple, NOT a hash), find those in >=2 docs, excise
    every covered token position."""
    grams: dict[tuple, set[int]] = defaultdict(set)
    toks = {d: _norm_tokens(t) for d, t in docs.items()}
    for d, tk in toks.items():
        for i in range(len(tk) - k + 1):
            grams[tuple(tk[i : i + k])].add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    out = {}
    for d, tk in toks.items():
        covered: set[int] = set()
        for i in range(len(tk) - k + 1):
            if tuple(tk[i : i + k]) in dup:
                covered.update(range(i, i + k))
        kept = [t for j, t in enumerate(tk) if j not in covered]
        out[d] = (
            len(tk),
            len(covered),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_span_removal_matches_reference(spark, tmp_path):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = {
        1: f"unique one two three {shared} tail a b c",
        2: f"{shared} completely different middle part here now",
        # doc 3: shares NOTHING 8 tokens long with others
        3: "lorem ipsum dolor sit amet consectetur adipiscing elit sed",
        # doc 4: shorter than k -> no shingles, nothing removed
        4: "tiny doc",
        # doc 5: exact copy of doc 3 -> doc 3 and 5 both fully covered
        5: "lorem ipsum dolor sit amet consectetur adipiscing elit sed",
        # doc 6: repeated span INSIDE one doc only -> multiplicity
        # counts DOCS, so an intra-doc repeat alone is NOT removed
        6: "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8",
    }
    ref = _reference_removal(docs, _K)

    sdf = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id int, text string"
    )
    # replicate the query body over an in-memory table (the
    # registered query loads from parquet; the kernel is identical)
    pos_sh = sdf.select(
        "doc_id", F.posexplode(shingle_hashes("text")).alias("p0", "sh")
    ).select("doc_id", (F.col("p0") + 1).alias("s"), "sh")
    dup = (
        sdf.select(F.explode(F.array_distinct(shingle_hashes("text"))).alias("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("sh")
    )
    cov = pos_sh.join(dup, "sh").groupBy("doc_id").agg(
        F.collect_set("s").alias("starts")
    )
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "),
        lambda t: t != "",
    )
    covered = F.array_distinct(
        F.flatten(F.transform("starts", lambda s: F.sequence(s, s + (_K - 1))))
    )
    empty = F.array().cast("array<int>")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["kept_md5"])
        for r in (
            sdf.select("doc_id", toks.alias("tk"), "text")
            .join(cov, "doc_id", "left")
            .select(
                "doc_id",
                F.size("tk").alias("n_tokens"),
                F.coalesce(F.size(covered), F.lit(0)).alias("n_removed"),
                F.md5(
                    F.concat_ws(
                        " ",
                        F.filter(
                            "tk",
                            lambda t, i: ~F.array_contains(
                                F.coalesce(covered, empty), i + 1
                            ),
                        ),
                    )
                ).alias("kept_md5"),
            )
            .collect()
        )
    }
    assert got == ref
    # structural spot checks the reference construction guarantees
    assert got[4][1] == 0  # sub-k doc untouched
    assert got[3][1] == got[3][0] and got[5][1] == got[5][0]  # full copies excised
    assert got[6][1] == 0  # intra-doc repeat alone survives
    assert 0 < got[1][1] < got[1][0]  # partial overlap: some, not all
