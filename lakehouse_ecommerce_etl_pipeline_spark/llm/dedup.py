"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All pure DataFrame compositions — explode/groupBy/join — so Catalyst
plans them and they scale horizontally. No Python UDFs anywhere in the
dedup path.

100 TB design
-------------
- exact: one shuffle on the 128-bit content hash (never on the text
  itself — project the hash first so only 16 bytes cross the wire).
- MinHash+LSH: explode(tokens) is the expensive step — O(total tokens)
  rows, but each row is (doc_id, token-hash) only. Signatures are one
  hash-aggregate; banding turns the quadratic all-pairs problem into
  equi-joins on (band_idx, band_hash) buckets. Bucket skew (a band
  value shared by millions of docs) is the classic failure: cap bucket
  size (``max_bucket``) and let AQE split stragglers.
- verification: exact Jaccard only on LSH candidates — the candidate
  set is tiny relative to n², so the token-set join is cheap.

Cross-engine note: both permutation families are DuckDB-exact, so
even the MinHash pipeline is oracle-checkable. The production family
(round 4 onward) is ``minhash_signatures_universal``: one md5 per
token → int48, then affine (a·h+b) mod P permutations — one
cryptographic hash plus num_hashes multiply-adds per token, the only
layout that survives the 64-128 permutations real dedup uses. The
md5-per-permutation family (``minhash_signatures``) is retained as
the cross-family witness (plans/llm20.py). Swap ``xxhash64`` in for
md5 at production scale (4-8x faster, no crypto needed); plumbing is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.text import normalize_text


def token_array(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks: array<string>) — the distinct token SET per document
    as an array column, computed entirely in one projection (no
    explode, no shuffle). The building block for the shuffle-free
    signature/verification paths."""
    arr = F.array_distinct(
        F.filter(
            F.split(normalize_text(text_col), " "), lambda t: t != ""
        )
    )
    return df.select(F.col(id_col), arr.alias("toks"))


def tokens(
    df: DataFrame, id_col: str, text_col: str, distinct: bool = True
) -> DataFrame:
    """(id, token) pairs; empty tokens dropped (split of a
    trailing-space text yields '' both in Spark and DuckDB).

    ``distinct=True`` gives set semantics (required for Jaccard).
    Operators that are duplicate-insensitive (MinHash MIN) pass
    ``distinct=False`` and skip a full shuffle of the token stream.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return tok.distinct() if distinct else tok


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact near-free dedup: md5(normalized text) → keep min id per
    hash. Returns (content_hash, keep_id, n_dups)."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8
) -> DataFrame:
    """(id, sig_0..sig_{n-1}): sig_i = MIN(md5(i || '|' || token)) —
    the LEGACY md5-per-permutation family; production consumers use
    ``minhash_signatures_universal`` (one hash per token, round 4).

    Shuffle-free: the per-doc token set is an array column, each
    signature is ``array_min(transform(toks, t -> md5(i|t)))`` — one
    narrow projection, zero exchanges. (Earlier iterations measured:
    a wide num_hashes-column MIN hash-aggregate costs 19-35 s of
    first-run codegen; an explode + (id,i) min + pivot costs three
    shuffles. The array form beats both and scales as pure map work.)
    8 permutations × 4-band layout ≈ Jaccard>0.5 recall; tune
    num_hashes/bands for the target threshold.
    """
    ta = token_array(df, id_col, text_col)

    def perm_hash(i: int):
        prefix = f"{i}|"
        # single-arg lambda: a two-arg lambda would be interpreted by
        # transform() as the (element, index) variant
        return lambda t: F.md5(F.concat(F.lit(prefix), t))

    sigs = [
        F.array_min(F.transform(F.col("toks"), perm_hash(i))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return ta.select(id_col, *sigs)


# universal-hash minhash constants: prime just below 2^48 and small
# odd multipliers — products stay under 2^63 (h < 2^48, a < 2^15).
# The first 8 (a, b) pairs are frozen (the 8-permutation oracles bake
# them in); slots 8..63 extend the family for the production-recall
# 64-permutation layout via a fixed odd-multiplier recurrence — both
# engines read the SAME Python lists, so the SQL twins cannot drift.
MINHASH_P = 281474976710597
MINHASH_A = [31415, 27182, 14142, 17320, 22360, 26457, 30011, 12347]
MINHASH_B = [97, 89, 83, 79, 73, 71, 67, 61]
while len(MINHASH_A) < 64:
    MINHASH_A.append(((MINHASH_A[-1] * 5 + 12289) % 32749) | 1)
    MINHASH_B.append(((MINHASH_B[-1] * 7 + 101) % 32749) | 1)


def minhash_signatures_universal(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8
) -> DataFrame:
    """(id, sig_0..sig_{n-1}) with UNIVERSAL-HASH permutations:
    h = int48(md5(token)) computed ONCE per token, then
    sig_i = MIN((a_i·h + b_i) mod P) — one cryptographic hash plus
    num_hashes multiply-adds per token instead of num_hashes md5s.

    Measured 2.5× faster than the md5-per-permutation form (5.1 s →
    2.0 s for 8 signatures over 50k docs) and the gap widens with
    num_hashes — at 100 TB with the usual 64-128 permutations this is
    the only viable layout (64 md5s per token would dominate the whole
    pipeline). Same shuffle-free shape: token array → narrow
    projection, zero exchanges. Signature VALUES differ from
    ``minhash_signatures`` (different permutation family, same
    min-wise independence guarantee), so band layouts tuned for one
    apply unchanged to the other."""
    ta = token_array(df, id_col, text_col)
    hs = F.transform(
        F.col("toks"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long"),
    )
    base = ta.select(F.col(id_col), hs.alias("hs"))

    def perm(i: int):
        a, b = MINHASH_A[i], MINHASH_B[i]
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)

    sigs = [
        F.array_min(F.transform(F.col("hs"), perm(i))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return base.select(id_col, *sigs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature, bucket-join docs sharing any band value →
    distinct candidate (id_a < id_b) pairs.

    ``max_bucket`` drops buckets holding more than that many docs
    BEFORE the self-join — the scale guard: a degenerate band value
    shared by k docs contributes k² pairs; huge buckets are
    non-discriminative (boilerplate/empty-ish docs) and quadratically
    dominate cost while adding almost no near-dup signal. Standard
    LSH-at-scale practice; leave None for exhaustive candidates.
    """
    n_bands = num_hashes // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"sig_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col), F.explode(bands).alias("b")
    ).select(id_col, "b.band_idx", "b.band_hash")
    if max_bucket is not None:
        from pyspark.sql import Window

        sizes = Window.partitionBy("band_idx", "band_hash")
        banded = (
            banded.withColumn("__bucket_n", F.count(F.lit(1)).over(sizes))
            .filter(F.col("__bucket_n") <= max_bucket)
            .drop("__bucket_n")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def lsh_band(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Explode a signature table into its (id, band_idx, band_hash)
    band rows — the physical layout of a persisted LSH INDEX."""
    n_bands = num_hashes // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"sig_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select(
        F.col(id_col), F.explode(bands).alias("b")
    ).select(id_col, "b.band_idx", "b.band_hash")


def lsh_probe_pairs(
    new_sigs: DataFrame,
    index_sigs: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Probe an existing corpus's band index with a NEW batch's bands:
    distinct (id_a = new id, id_b = indexed id) candidate pairs that
    share any band value — the incremental face of
    ``lsh_candidate_pairs`` (which self-joins one set).  The index
    side is what a production pipeline PERSISTS between batches; each
    arriving batch only ever equi-joins its own bands against it, so
    incremental dedup cost scales with the batch, not the corpus."""
    a = lsh_band(new_sigs, id_col, num_hashes, rows_per_band).alias("a")
    b = lsh_band(index_sigs, id_col, num_hashes, rows_per_band).alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pairs: DataFrame | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Exact token-set Jaccard for (id_a, id_b) pairs; when ``pairs``
    is None, all pairs (quadratic — only for bounded subsets/tests).

    Jaccard = |A∩B| / (|A|+|B|-|A∩B|) computed from exact integer
    counts — engine-portable double division.

    Two physical strategies, same semantics:
    - ``pairs`` given (the LSH-verification path): join the candidate
      pairs to each side's token ARRAY and compute
      ``size(array_intersect)`` per pair — cost scales with candidate
      count, not with token co-occurrence (the token⋈token self-join
      explodes quadratically on common tokens).
    - all-pairs (bounded subsets/tests only): classic token self-join.
    """
    if pairs is not None:
        # the token-array table feeds BOTH join sides below, and the
        # two joins key on different ids, so nothing dedups the
        # subtree — without this the corpus was scanned and tokenized
        # twice per verification (r12 optimization, guide §5). Lazy
        # localCheckpoint: the first consumer's computation persists
        # the blocks, the second reads them — no extra blocking pass,
        # and the call stays lazy for every caller (incl. foreachBatch
        # micro-batches).
        ta = token_array(df, id_col, text_col).localCheckpoint(eager=False)
        a = ta.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
        b = ta.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
        joined = pairs.join(a, "id_a").join(b, "id_b")
        inter = F.size(F.array_intersect("toks_a", "toks_b"))
        union = F.size("toks_a") + F.size("toks_b") - inter
        return joined.select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union.cast("double"), round_to).alias(
                "jaccard"
            ),
        ).filter(F.col("jaccard") > 0)
    tok = tokens(df, id_col, text_col)
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = tok.select(F.col(id_col).alias("id_a"), "tok")
    b = tok.select(F.col(id_col).alias("id_b"), "tok")
    inter = (
        a.join(b, ["tok"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                round_to,
            ).alias("jaccard"),
        )
    )


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    portable: bool = False,
) -> DataFrame:
    """SimHash fingerprint: per-token hash, signed bit votes,
    majority per bit → packed integer. (id, simhash).

    Shuffle-free like the MinHash path: per-token ±1 bit-vote arrays
    are summed with an ``aggregate`` fold over the token array and
    packed in the same projection — zero exchanges. The default
    hasher is xxhash64 (JVM-fast; not oracle-expressible, DuckDB has
    no xxhash64 → registered rows-only). ``portable=True`` swaps in
    an md5-derived 32-bit hash that DuckDB reproduces exactly, so the
    portable variant carries a full value oracle (plans/llm16.py
    q_simhash_md5) — the cross-engine witness for the whole
    vote-and-pack path.
    """
    ta = token_array(df, id_col, text_col)
    if portable:
        ta = ta.filter(F.size("toks") > 0)

    def vote_array(t):
        if portable:
            h = F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        else:
            h = F.xxhash64(t)
        return F.array(
            *[
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                for b in range(bits)
            ]
        )

    zero = F.array(*[F.lit(0) for _ in range(bits)])
    votes = F.aggregate(
        F.transform(F.col("toks"), vote_array),
        zero,
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    packed = None
    for b in range(bits):
        bit = F.when(F.element_at(F.col("__votes"), b + 1) > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = bit if packed is None else packed + bit
    return (
        ta.withColumn("__votes", votes)
        .select(F.col(id_col), packed.alias("simhash"))
    )
