"""Product quantization (PQ) for embedding search — the memory-bound
scale path of the ANN tier (FAISS-style IndexPQ, public algorithm:
Jégou et al., "Product Quantization for Nearest Neighbor Search").

The embedding space is split into ``m`` subspaces; each subspace gets
its own small k-means codebook (reusing llm/kmeans.py's JVM-side
assign/update steps with deterministic smallest-id seeding); a vector
is stored as m small integer codes (64-dim float32 → 4 bytes at
m=4/k=8 — a 64× compression), and a query scans codes with an
asymmetric-distance lookup table (ADC): distance ≈ Σ_j
LUT_j[code_j], where LUT_j holds the query-to-centroid distances of
subspace j.

100 TB: codebooks are k×dim doubles (driver/broadcast-sized — the
same synchronization point as k-means); encoding is one narrow pass;
ADC search reads ONLY the m-byte code column — the point of PQ is
that the scan is code-table-sized, not embedding-table-sized. Compose
with IVF (llm/similarity.py) for the standard IVFPQ: coarse cells
prune the scan, PQ compresses the residuals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.kmeans import (
    assign_clusters,
    update_centroids,
)


def _sub(vec_col: str, j: int, subdim: int) -> F.Column:
    """Subvector j of an array column (1-based slice), as double."""
    return F.slice(F.col(vec_col).cast("array<double>"), j * subdim + 1, subdim)


def train_codebooks(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """One k-means codebook per subspace (deterministic smallest-id
    seeding, Lloyd iterations); returns codebooks[m][k][subdim].

    The (id, vector) projection is materialized once (localCheckpoint)
    before the m concurrent training loops: each subspace re-reads it
    2 + 2·iters times, so without it the upstream scan/derivation ran
    m·(2 + 2·iters) times (r12 optimization, guide §5).  Partitioning
    is preserved, so the float mean trajectories are bit-identical."""
    df = df.select(id_col, vec_col).localCheckpoint(eager=True)
    dim = len(df.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    subdim = dim // m

    def train_one(j: int) -> list[list[float]]:
        sub = df.select(id_col, _sub(vec_col, j, subdim).alias("embedding"))
        seeds = [
            [float(x) for x in r[0]]
            for r in sub.orderBy(id_col).limit(k).select("embedding").collect()
        ]
        centroids = seeds
        assigned = assign_clusters(sub, centroids, "embedding")
        for _ in range(iters):
            centroids = update_centroids(assigned, subdim, "embedding")
            assigned = assign_clusters(sub, centroids, "embedding")
        return centroids

    # subspaces are independent — train them as concurrent Spark jobs
    # (one driver thread each; the scheduler interleaves their stages),
    # collapsing m serial synchronization chains into one
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=m) as ex:
        return list(ex.map(train_one, range(m)))


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as m codes (argmin centroid per subspace,
    the same least()/when() JVM chain as cluster assignment);
    returns (id, codes array<int>)."""
    m = len(codebooks)
    subdim = len(codebooks[0][0])
    code_cols = []
    out = df
    for j, cb in enumerate(codebooks):
        sub = out.select(
            "*", _sub(vec_col, j, subdim).alias("__sub")
        )
        assigned = assign_clusters(sub, cb, "__sub").withColumnRenamed(
            "cluster", f"__c{j}"
        )
        out = assigned.drop("__sub", "dist_sq")
        code_cols.append(f"__c{j}")
    return out.select(
        id_col, F.array(*[F.col(c) for c in code_cols]).alias("codes")
    )


def _dist_to(q: list[float], c: list[float]) -> float:
    return sum((a - b) * (a - b) for a, b in zip(q, c))


def adc_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: per subspace, the query-to-centroid
    distances become a literal lookup array; a row's approximate
    distance is the sum of its code lookups — a pure projection over
    the (id, codes) table, no embedding column read."""
    m = len(codebooks)
    subdim = len(codebooks[0][0])
    terms = []
    for j, cb in enumerate(codebooks):
        qj = query[j * subdim : (j + 1) * subdim]
        lut = F.array(*[F.lit(_dist_to(qj, c)) for c in cb])
        terms.append(
            F.element_at(lut, F.element_at(F.col("codes"), j + 1) + 1)
        )
    dist = terms[0]
    for t in terms[1:]:
        dist = dist + t
    return (
        codes_df.select(id_col, dist.alias("adc_dist_sq"))
        .orderBy("adc_dist_sq", id_col)
        .limit(k)
    )


# ------------------------------------------------------------- IVFPQ


def _lloyd_centroids(
    df: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Coarse k-means centroids (smallest-id seeding, Lloyd loop) —
    the same synchronization shape as llm/kmeans.kmeans, returning
    the centroids themselves."""
    dim = len(df.select(vec_col).first()[0])
    seeds = [
        [float(x) for x in r[0]]
        for r in df.orderBy(id_col).limit(k).select(vec_col).collect()
    ]
    centroids = seeds
    assigned = assign_clusters(df, centroids, vec_col)
    for _ in range(iters):
        centroids = update_centroids(assigned, dim, vec_col)
        assigned = assign_clusters(df, centroids, vec_col)
    return centroids


def ivfpq_index(
    df: DataFrame,
    kc: int = 4,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build the composed IVF+PQ index (FAISS IndexIVFPQ shape):
    coarse cells from k-means, then PQ codebooks trained on the
    RESIDUALS (vector − cell centroid) — residual quantization is
    what makes small codebooks accurate across a clustered space.
    Returns (codes_df(id, cell, codes), coarse_centroids, codebooks).

    100 TB: the index build is two bounded k-means loops plus one
    encode pass; the stored index is the (id, cell, m-byte codes)
    table — the embedding column is never read again at query time."""
    # one materialization serves the coarse Lloyd loop (2 + 2·iters
    # passes) and the residual derivation (r12 optimization, guide §5)
    df = df.select(id_col, vec_col).localCheckpoint(eager=True)
    cents = _lloyd_centroids(df, kc, iters, id_col, vec_col)
    assigned = assign_clusters(df, cents, vec_col)
    cent_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in cents]
    )
    res = assigned.select(
        id_col,
        F.col("cluster").alias("cell"),
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.element_at(cent_lit, F.col("cluster") + 1),
            lambda a, b: a - b,
        ).alias("residual"),
    # materialized once: res feeds codebook training, the encode pass
    # AND the (id, cell) re-attach below — each re-ran the coarse
    # assignment chain before (r12 optimization, guide §5)
    ).localCheckpoint(eager=True)
    cbs = train_codebooks(
        res, m=m, k=k, iters=iters, id_col=id_col, vec_col="residual"
    )
    codes = pq_encode(res, cbs, id_col=id_col, vec_col="residual")
    codes = res.select(id_col, "cell").join(codes, id_col)
    return codes, cents, cbs


def ivfpq_topk(
    codes_df: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFPQ query: probe the ``n_probe`` nearest cells; within each,
    ADC against a PER-CELL lookup table built from the query's
    residual in that cell (q − cell centroid). The scan touches only
    probed cells' code rows; distances dispatch through a small
    when-chain on the cell id.

    100 TB: candidate volume = probed share of the code table; cells
    partition the codes, so the probe is partition pruning, and the
    ADC projection is the only per-row work."""
    cell_d = [
        (sum((a - b) * (a - b) for a, b in zip(query, c)), i)
        for i, c in enumerate(coarse)
    ]
    probed = [i for _, i in sorted(cell_d)[:n_probe]]
    m = len(codebooks)
    subdim = len(codebooks[0][0])

    def adc_for_cell(cell: int) -> F.Column:
        qres = [q - c for q, c in zip(query, coarse[cell])]
        terms = []
        for j, cb in enumerate(codebooks):
            qj = qres[j * subdim : (j + 1) * subdim]
            lut = F.array(*[F.lit(_dist_to(qj, c)) for c in cb])
            terms.append(
                F.element_at(lut, F.element_at(F.col("codes"), j + 1) + 1)
            )
        d = terms[0]
        for t in terms[1:]:
            d = d + t
        return d

    dist = None
    for cell in probed:
        expr = adc_for_cell(cell)
        dist = (
            F.when(F.col("cell") == cell, expr)
            if dist is None
            else dist.when(F.col("cell") == cell, expr)
        )
    return (
        codes_df.filter(F.col("cell").isin(probed))
        .select(id_col, "cell", dist.alias("adc_dist_sq"))
        .orderBy("adc_dist_sq", id_col)
        .limit(k)
    )
