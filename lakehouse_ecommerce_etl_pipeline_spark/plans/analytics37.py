"""Analytics tier XXXVII: leakage-safe temporal splits, class
balancing, the hashing trick, collocation mining, late-arriving
dimension repair.

New shapes over I-XXXVI: a time-based train/test split with
cold-start exclusion (the evaluation split a recommender actually
needs — hash splits leak future behavior into training),
deterministic class-balanced downsampling (per-label md5-priority
truncation to the minority count), feature hashing (the fixed-width
sparse vectorizer that needs no vocabulary pass), PMI-style token
collocation mining (word-pair association — the transpose of
doc-pair similarity), and inferred-member repair for late-arriving
dimensions (facts referencing dim keys that haven't landed yet get
stub members instead of quarantine).

Cross-engine exactness: the split and balance decisions are md5/
timestamp compares; hashed features are signed integer counts; the
PMI ratio is one IEEE division of sub-2^53 integer products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_SPLIT_CUTOFF = "2024-01-02 00:00:00"

_HASH_DIM = 64

_PMI_MIN_CO = 10


@register(
    "q_temporal_split_leakage_safe",
    oracle=f"""
    WITH train AS (
      SELECT event_id, user_id, ts FROM events
      WHERE ts < TIMESTAMP '{_SPLIT_CUTOFF}'
    )
    SELECT event_id, user_id, ts, 'train' AS split FROM train
    UNION ALL
    SELECT e.event_id, e.user_id, e.ts, 'test' AS split
    FROM events e
    WHERE e.ts >= TIMESTAMP '{_SPLIT_CUTOFF}'
      AND e.user_id IN (SELECT DISTINCT user_id FROM train)
    """,
)
def q_temporal_split_leakage_safe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leakage-safe temporal train/test split: everything before the
    cutoff trains; after-cutoff events are eligible for test ONLY for
    users with training history (cold-start users are excluded, since
    a model can't be evaluated on users it never saw).  This is the
    split a sequential/recommendation model needs — the md5 hash split
    (q_split_train_val) is i.i.d.-correct but temporally leaky: a
    user's future events land in train while their past lands in test.

    100 TB: the cutoff predicates push to the parquet scan
    (time-partitioned tables prune whole partitions); the cold-start
    exclusion is a semi join against the distinct train-user set —
    broadcastable long before it matters, since the user dimension is
    orders of magnitude smaller than events."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    cutoff = F.lit(_SPLIT_CUTOFF).cast("timestamp")
    train = ev.filter(F.col("ts") < cutoff)
    train_users = train.select("user_id").distinct()
    test = ev.filter(F.col("ts") >= cutoff).join(
        F.broadcast(train_users), "user_id", "semi"
    )
    return train.withColumn("split", F.lit("train")).unionByName(
        test.withColumn("split", F.lit("test"))
    ).select("event_id", "user_id", "ts", "split")


@register(
    "q_class_downsample_balanced",
    oracle="""
    WITH m AS (
      SELECT MIN(cnt) AS m FROM (
        SELECT COUNT(*) AS cnt FROM embeddings GROUP BY label
      )
    ),
    r AS (
      SELECT vec_id, label,
             row_number() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
      FROM embeddings
    )
    SELECT vec_id, label FROM r WHERE rk <= (SELECT m FROM m)
    """,
)
def q_class_downsample_balanced(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Class-balanced downsampling: every label keeps exactly
    min-class-count rows, selected by md5 priority (deterministic,
    engine-portable, uniform) — the balancing step before training a
    classifier on skewed labels.  Exact-k per class, unlike
    fraction-based sampleBy which only balances in expectation.

    100 TB: one skinny count per label (map-side combined, collected
    O(#labels) to the driver for the min), then a per-label window
    top-k — rank truncation shuffles each class once; for extreme
    minority/majority ratios, pre-filter the majority classes with an
    md5-threshold pass (q_source_mixture_sample's dyadic trick) so the
    sort only sees ~k rows per class."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    m = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt"))
        .collect()[0][0]
    )
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        emb.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= m)
        .select("vec_id", "label")
    )


@register(
    "q_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             CAST(CONCAT('0x', substring(md5(tok), 1, 6)) AS BIGINT)
               AS hv
      FROM tok
    )
    SELECT doc_id,
           CAST(hv % {_HASH_DIM} AS INT) AS bucket,
           CAST(SUM(CASE WHEN (hv // {_HASH_DIM}) % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS weight
    FROM h
    GROUP BY doc_id, hv % {_HASH_DIM}
    HAVING SUM(CASE WHEN (hv // {_HASH_DIM}) % 2 = 0
               THEN 1 ELSE -1 END) <> 0
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: tokens map straight to one of 64 buckets via
    md5, with a second hash bit choosing the sign so collisions cancel
    in expectation (the Weinberger et al. signed feature hash) — a
    fixed-width sparse vectorizer that needs NO vocabulary pass, no
    driver state, and no join.  Output is the long-form nonzero
    (doc_id, bucket, weight) representation.

    100 TB: embarrassingly parallel — explode + hash arithmetic is
    codegen'd per input split and the only shuffle is the final
    (doc_id, bucket) combine, which partial aggregation collapses to
    at most 64 rows per doc before it moves; contrast q_vocab_topn,
    which must materialize and broadcast a vocabulary first."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.trim("text"), " ")).alias("tok"),
    )
    h = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 6), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    sign = F.when(
        F.expr(f"(hv div {_HASH_DIM}) % 2") == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        h.groupBy(
            "doc_id", (F.col("hv") % _HASH_DIM).cast("int").alias("bucket")
        )
        .agg(F.sum(sign).cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
    )


@register(
    "q_pmi_collocations",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    co AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS n_co
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok
    )
    SELECT co.tok_a, co.tok_b, co.n_co,
           da.df AS df_a, db.df AS df_b,
           CAST((SELECT n_docs FROM n) * co.n_co AS DOUBLE)
             / CAST(da.df * db.df AS DOUBLE) AS pmi_ratio
    FROM co
    JOIN df da ON da.tok = co.tok_a
    JOIN df db ON db.tok = co.tok_b
    WHERE co.n_co >= {_PMI_MIN_CO}
    """,
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: for every token pair co-occurring in >= 10
    documents, the pointwise-mutual-information ratio
    P(a,b)/(P(a)P(b)) = n_docs·co/(df_a·df_b) — ratio > 1 means the
    words attract, < 1 means they repel.  This is the TRANSPOSE of
    doc-pair similarity (q_tf_cosine_pairs): pairs of words over the
    document join, not pairs of documents over the word join — the
    vocabulary-association table feeding stop-pair lists and phrase
    detection.  The log is left to the consumer so the emitted ratio
    stays one exact IEEE division of integer counts.

    100 TB: per-doc pairs are enumerated ARRAY-SIDE (sorted distinct
    tokens -> combinations, the order_part_pairs build) so the only
    shuffles are the per-doc token collect and the pair-count combine;
    the df table is vocabulary-sized and broadcast onto the result.
    Vocabulary explosion is the real-world knob: cap per-doc distinct
    tokens or pre-filter to a frequency band before pairing."""
    dt = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok"))
        .distinct()
    )
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = load(spark, sf_dir, "documents").count()
    baskets = dt.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("tok")).alias("toks")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(toks, (x, i) ->"
                " transform(slice(toks, i + 2, size(toks)),"
                " y -> struct(x AS tok_a, y AS tok_b))))"
            )
        ).alias("p")
    ).select("p.tok_a", "p.tok_b")
    co = (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= _PMI_MIN_CO)
    )
    da = df.select(F.col("tok").alias("ta"), F.col("df").alias("df_a"))
    db = df.select(F.col("tok").alias("tb"), F.col("df").alias("df_b"))
    return (
        co.join(F.broadcast(da), co["tok_a"] == da["ta"])
        .join(F.broadcast(db), co["tok_b"] == db["tb"])
        .select(
            "tok_a",
            "tok_b",
            "n_co",
            "df_a",
            "df_b",
            # count products on DECIMAL(38,0) (the q_ks_drift
            # discipline): N·co and df_a·df_b are ≤ N² and would throw
            # under ANSI int64 at ~3e9 docs; pair-grain rows make the
            # widening free, decimal→double rounds identically.
            (
                (
                    F.lit(n_docs).cast("decimal(38,0)")
                    * F.col("n_co").cast("decimal(38,0)")
                ).cast("double")
                / (
                    F.col("df_a").cast("decimal(38,0)")
                    * F.col("df_b").cast("decimal(38,0)")
                ).cast("double")
            ).alias("pmi_ratio"),
        )
    )


@register(
    "q_late_arriving_dim",
    oracle="""
    WITH dim AS (
      SELECT * FROM customer WHERE c_custkey % 41 <> 0
    ),
    missing AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM dim)
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           FALSE AS is_inferred
    FROM dim
    UNION ALL
    SELECT k AS c_custkey,
           CONCAT('INFERRED-', CAST(k AS VARCHAR)) AS c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           CAST(NULL AS DOUBLE) AS c_acctbal,
           'UNKNOWN' AS c_mktsegment,
           TRUE AS is_inferred
    FROM missing
    """,
)
def q_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension repair (inferred members): facts that
    reference dimension keys not yet landed (simulated by withholding
    every 41st customer) get placeholder members — key, sentinel
    name, UNKNOWN segment, is_inferred=true — so the fact load never
    drops or quarantines rows for referential lag; the real member
    row later overwrites the stub via the usual MERGE
    (q_merge_upsert).  This REPAIRS where q_rejected_records rejects
    and q_join_leftanti merely detects.

    100 TB: the missing-key set is a distinct projection of fact
    foreign keys anti-joined against the dimension — the dim side
    broadcasts, the distinct is map-side combined, and the stub
    union is dimension-sized, not fact-sized."""
    dim = load(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 41 != 0
    )
    missing = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .join(
            F.broadcast(dim.select(F.col("c_custkey").alias("k"))),
            "k",
            "anti",
        )
    )
    stubs = missing.select(
        F.col("k").alias("c_custkey"),
        F.concat(F.lit("INFERRED-"), F.col("k").cast("string")).alias(
            "c_name"
        ),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit("UNKNOWN").alias("c_mktsegment"),
        F.lit(True).alias("is_inferred"),
    )
    return dim.withColumn("is_inferred", F.lit(False)).unionByName(stubs)
