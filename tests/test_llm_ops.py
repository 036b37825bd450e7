from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.text import lang_id, n_tokens
from lakehouse_ecommerce_etl_pipeline_spark.functions.vectors import cosine, lit_vector
from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)
from lakehouse_ecommerce_etl_pipeline_spark.llm.multimodal import (
    decode_image,
    extract_image_metadata,
    synthetic_blobs,
)
from lakehouse_ecommerce_etl_pipeline_spark.llm.similarity import (
    brute_force_topk,
    ivf_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")  # one-token edit → high jaccard
    other = "completely different words about spark query engines and shuffles"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], "doc_id long, text string"
    )


def test_exact_dedup_groups_identical_texts(docs):
    out = {r.keep_id: r.n_dups for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert out[1] == 2  # docs 1 and 2 identical
    assert out[3] == 1 and out[4] == 1


def test_minhash_lsh_finds_planted_near_dup(docs):
    sigs = minhash_signatures(docs, "doc_id", "text", 8)
    pairs = {(r.id_a, r.id_b) for r in
             lsh_candidate_pairs(sigs, "doc_id", 8, 2).collect()}
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 3) in pairs  # near-dup caught by at least one band
    assert (1, 4) not in pairs  # unrelated doc not a candidate


def test_jaccard_values(docs):
    j = {(r.id_a, r.id_b): r.jaccard for r in
         jaccard_pairs(docs, "doc_id", "text").collect()}
    assert j[(1, 2)] == 1.0
    assert 0.8 < j[(1, 3)] < 1.0
    assert j.get((1, 4), 0.0) < 0.2


def test_simhash_similarity_structure(docs):
    h = {r.doc_id: r.simhash for r in simhash(docs, "doc_id", "text").collect()}
    assert h[1] == h[2]
    ham_near = bin(h[1] ^ h[3]).count("1")
    ham_far = bin(h[1] ^ h[4]).count("1")
    assert ham_near < ham_far  # near-dup closer in hamming space


def test_brute_force_and_ivf_topk(spark):
    import math

    vecs = [
        (i, [math.cos(i / 10.0), math.sin(i / 10.0), 0.5]) for i in range(50)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("qvec"))
    exact = [r.vec_id for r in brute_force_topk(df, q, k=5).collect()]
    assert exact[0] == 7  # self-match first
    approx = [r.vec_id for r in
              ivf_topk(df, q, k=5, n_centroids=5, n_probe=2).collect()]
    assert 7 in approx


def test_cosine_identity(spark):
    df = spark.createDataFrame([(1,)], "id int").select(
        cosine(lit_vector([1.0, 2.0, 3.0]), lit_vector([1.0, 2.0, 3.0])).alias("c")
    )
    assert abs(df.collect()[0].c - 1.0) < 1e-12


def test_lang_id_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the hat of the house"), (2, "xyzzy plugh")],
        "id int, text string",
    ).select("id", lang_id("text").alias("lang"), n_tokens("text").alias("nt"))
    rows = {r.id: (r.lang, r.nt) for r in df.collect()}
    assert rows[1] == ("en", 8)
    assert rows[2] == ("und", 2)  # no marker hits


def test_multimodal_stub_contract(spark):
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    meta = extract_image_metadata(synthetic_blobs(docs), fake=True).collect()[0]
    assert meta.n_bytes == len(b"hello world")
    assert 64 <= meta.width < 256 and 64 <= meta.height < 256
    assert meta.format in {"png", "jpeg", "webp"}
    # real path: JPEG now decodes (llm/jpeg.py) — a truncated payload
    # is a parse error, not a capability gate; webp stays honestly
    # gated; junk is rejected
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0rest-of-jpeg", fake=False)
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ", fake=False)
    with pytest.raises(ValueError):
        decode_image(b"not an image", fake=False)


def test_lsh_max_bucket_prunes_degenerate_buckets(spark):
    # 20 docs sharing identical text → every band bucket has 20 docs
    docs = spark.createDataFrame(
        [(i, "common boilerplate text shared by everyone") for i in range(20)]
        + [(100, "a unique document about spark plans"),
           (101, "a unique document about spark plans")],
        "doc_id long, text string",
    )
    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(docs, "doc_id", "text", 8)
    full = lsh_candidate_pairs(sigs, "doc_id", 8, 2).count()
    capped = lsh_candidate_pairs(sigs, "doc_id", 8, 2, max_bucket=5)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert full >= 190  # the 20-clone bucket alone yields 190 pairs
    assert pairs == {(100, 101)}  # cap kills the degenerate bucket only


def test_connected_components_chains_and_singletons(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.llm.components import (
        connected_components,
        dedup_keep_list,
    )

    # chain 1-2-3, pair 10-11, isolated 99
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comps = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
    verdict = {r.doc_id: (r.component, r.keep) for r in
               dedup_keep_list(docs, pairs, "doc_id").collect()}
    assert verdict == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False), 99: (99, True),
    }


def test_connected_components_long_chain_converges(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.llm.components import (
        connected_components,
    )

    # a 12-node path: worst-case diameter for min-label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    comps = {r.node: r.component for r in connected_components(pairs).collect()}
    assert set(comps.values()) == {0}
    assert len(comps) == 12


def test_temporal_pool_bounds_and_frame_counts(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm9 import (
        q_multimodal_temporal_pool,
    )

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in q_multimodal_temporal_pool(spark, sf).collect()}
    docs = load(spark, sf, "documents").collect()
    assert len(out) == len(docs)
    for d in docs:
        r = out[d["doc_id"]]
        want_frames = max((len(d["text"]) + 63) // 64, 1)
        assert r["n_frames"] == want_frames
        for k in range(4):
            assert 0 <= r[f"mean_f{k}"] <= r[f"max_f{k}"] <= 0xFFFF
