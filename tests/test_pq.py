from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.llm.pq import (
    adc_topk,
    pq_encode,
    train_codebooks,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

SF0001 = "/root/testdata/sf0.001"
M, K = 4, 8


def _embeddings(spark):
    return load(spark, SF0001, "embeddings")


def test_codebook_shapes_and_code_ranges(spark):
    emb = _embeddings(spark)
    cbs = train_codebooks(emb, m=M, k=K, iters=2)
    assert len(cbs) == M
    dim = len(emb.select("embedding").first()[0])
    for cb in cbs:
        assert len(cb) == K
        assert all(len(c) == dim // M for c in cb)
    codes = pq_encode(emb, cbs).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == M
        assert all(0 <= c < K for c in r["codes"])


def test_adc_equals_exact_distance_to_reconstruction(spark):
    """ADC(q, codes(x)) must equal ||q - reconstruction(x)||^2: the
    lookup-table sum IS the distance to the quantized vector."""
    emb = _embeddings(spark)
    cbs = train_codebooks(emb, m=M, k=K, iters=2)
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cbs).collect()}
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    qid = min(vecs)
    q = vecs[qid]
    subdim = len(q) // M
    got = {
        r["vec_id"]: r["adc_dist_sq"]
        for r in adc_topk(
            spark.createDataFrame(
                [(i, c) for i, c in codes.items()],
                "vec_id bigint, codes array<int>",
            ),
            cbs,
            q,
            k=len(codes),
        ).collect()
    }
    for vid, cs in codes.items():
        recon = []
        for j, c in enumerate(cs):
            recon.extend(cbs[j][c])
        want = sum(
            (a - b) * (a - b)
            for a, b in zip(q, recon)
        )
        assert abs(got[vid] - want) < 1e-9 * (1 + want)


def test_pq_beats_single_centroid_quantizer(spark):
    """Mean reconstruction error with k=8 codebooks must beat the
    degenerate k=1 quantizer (everything snapped to one centroid) —
    the 'training actually helps' invariant, mirroring the k-means
    inertia test."""
    emb = _embeddings(spark)
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()
    }
    subdim = len(next(iter(vecs.values()))) // M

    def mean_err(cbs):
        codes = {
            r["vec_id"]: list(r["codes"])
            for r in pq_encode(emb, cbs).collect()
        }
        tot = 0.0
        for vid, cs in codes.items():
            recon = []
            for j, c in enumerate(cs):
                recon.extend(cbs[j][c])
            tot += sum((a - b) ** 2 for a, b in zip(vecs[vid], recon))
        return tot / len(codes)

    good = train_codebooks(emb, m=M, k=K, iters=2)
    degenerate = train_codebooks(emb, m=M, k=1, iters=1)
    assert mean_err(good) < mean_err(degenerate)


def test_adc_topk_contains_query_itself(spark):
    """The query vector is in the database; its own quantization must
    rank it at (or essentially at) the top."""
    emb = _embeddings(spark)
    cbs = train_codebooks(emb, m=M, k=K, iters=2)
    codes = pq_encode(emb, cbs)
    q = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    top = adc_topk(codes, cbs, q, k=10).collect()
    qid = emb.orderBy("vec_id").limit(1).collect()[0]["vec_id"]
    assert qid in {r["vec_id"] for r in top}


def test_ivfpq_candidates_from_probed_cells_and_adc_identity(spark):
    """IVFPQ: every result comes from a probed cell, the ADC value
    equals the exact distance to (cell centroid + residual
    reconstruction), and the query's own vector is retrieved."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.pq import (
        ivfpq_index,
        ivfpq_topk,
    )

    emb = _embeddings(spark)
    codes, coarse, cbs = ivfpq_index(emb, kc=4, m=M, k=K, iters=2)
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()
    }
    qid = min(vecs)
    q = vecs[qid]
    out = ivfpq_topk(codes, coarse, cbs, q, k=10, n_probe=2).collect()
    assert out
    cell_d = sorted(
        (sum((a - b) ** 2 for a, b in zip(q, c)), i)
        for i, c in enumerate(coarse)
    )
    probed = {i for _, i in cell_d[:2]}
    assert {r["cell"] for r in out} <= probed
    assert qid in {r["vec_id"] for r in out}
    # ADC identity per cell
    code_map = {r["vec_id"]: (r["cell"], list(r["codes"])) for r in codes.collect()}
    subdim = len(q) // M
    for r in out:
        cell, cs = code_map[r["vec_id"]]
        recon = list(coarse[cell])
        for j, c in enumerate(cs):
            for t, v in enumerate(cbs[j][c]):
                recon[j * subdim + t] += v
        want = sum((a - b) ** 2 for a, b in zip(q, recon))
        assert abs(r["adc_dist_sq"] - want) < 1e-9 * (1 + want)
