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
    seeding, Lloyd iterations); returns codebooks[m][k][subdim]."""
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
