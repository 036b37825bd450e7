"""Round-10 ADVICE closures: fingerprinted artifact freshness and
duplicate-id-safe rep-artifact builds.

1. ``artifact_fresh`` previously trusted mtime ordering alone — a
   testdata regeneration that PRESERVES timestamps (cp -p, rsync -t,
   tar) would silently serve a stale derived artifact.  The sibling
   ``.srcfp`` marker records (size, mtime_ns, head+tail md5) of the
   source; changed bytes under a preserved mtime now trigger a
   rebuild, and the protocol self-heals after the rebuild with no
   builder changes.
2. The vector/document rep artifacts re-attached the payload column
   with an id equi-join, which assumes id uniqueness — a
   duplicate-id source would fan out rows relative to the inline
   path.  ``keep_vec`` / ``keep_text`` carry the payload through the
   rep join itself: exactly one output row per input row, duplicate
   ids or not.
"""

from __future__ import annotations

import os

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    _marker_path,
    artifact_fresh,
)


def _touch(path: str, content: bytes, mtime_ns: int | None = None):
    with open(path, "wb") as f:
        f.write(content)
    if mtime_ns is not None:
        os.utime(path, ns=(mtime_ns, mtime_ns))


def test_preserved_mtime_regeneration_triggers_rebuild(tmp_path):
    src = str(tmp_path / "src.parquet")
    art = str(tmp_path / "derived")
    _touch(src, b"generation-one" * 100)
    src_mtime = os.stat(src).st_mtime_ns

    # build the artifact (newer than src), first check adopts marker
    os.makedirs(art)
    _touch(os.path.join(art, "part-0"), b"derived-bytes")
    assert artifact_fresh(src, art)
    assert os.path.exists(_marker_path(art))

    # regenerate the source IN PLACE with the exact same mtime
    _touch(src, b"generation-TWO" * 100, mtime_ns=src_mtime)
    assert not artifact_fresh(src, art), (
        "changed bytes under a preserved mtime must invalidate"
    )
    # the stale marker is dropped so a rebuild re-adopts
    assert not os.path.exists(_marker_path(art))

    # simulate the rebuild: artifact rewritten now (newer than src)
    _touch(os.path.join(art, "part-0"), b"derived-bytes-v2")
    assert artifact_fresh(src, art)
    assert os.path.exists(_marker_path(art))
    # and stays fresh on repeat checks
    assert artifact_fresh(src, art)


def test_same_size_same_mtime_different_bytes_detected(tmp_path):
    src = str(tmp_path / "src.parquet")
    art = str(tmp_path / "art.bin")
    _touch(src, b"A" * 5000)
    mt = os.stat(src).st_mtime_ns
    _touch(art, b"x")
    assert artifact_fresh(src, art)
    _touch(src, b"B" * 5000, mtime_ns=mt)  # same size, same mtime
    assert not artifact_fresh(src, art)


def test_empty_dir_artifact_never_fresh(tmp_path):
    src = str(tmp_path / "src")
    _touch(src, b"s")
    art = tmp_path / "empty_leaf"
    art.mkdir()
    assert not artifact_fresh(src, str(art))


def test_missing_artifact_not_fresh(tmp_path):
    src = str(tmp_path / "src")
    _touch(src, b"s")
    assert not artifact_fresh(src, str(tmp_path / "nope"))


def test_vector_reps_keep_vec_no_fanout_on_duplicate_ids(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.llm.similarity import (
        distinct_vector_reps,
    )

    rows = [
        (1, [1.0, 0.0]),
        (1, [1.0, 0.0]),  # duplicate id — an id re-join would fan out
        (2, [1.0, 0.0]),
        (3, [0.0, 0.0]),  # zero-norm keeps itself as rep
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    mm, rep_vectors = distinct_vector_reps(df, keep_vec=True)
    out = mm.select("vec_id", "rep_id", "embedding").collect()
    assert len(out) == len(rows), "one output row per input row"
    by = {(r.vec_id, tuple(r.embedding)): r.rep_id for r in out}
    assert by[(1, (1.0, 0.0))] == 1
    assert by[(2, (1.0, 0.0))] == 1
    assert by[(3, (0.0, 0.0))] == 3
    # rep_vectors derives from the member map — no id join either
    reps = {r.vec_id for r in rep_vectors.collect()}
    assert reps == {1, 3}

    # parity with the default path on a unique-id source
    uniq = spark.createDataFrame(rows[1:], ["vec_id", "embedding"])
    mm_default, _ = distinct_vector_reps(uniq)
    mm_kept, _ = distinct_vector_reps(uniq, keep_vec=True)
    assert sorted(
        (r.vec_id, r.rep_id) for r in mm_default.collect()
    ) == sorted((r.vec_id, r.rep_id) for r in mm_kept.collect())


def test_token_set_reps_keep_text_no_fanout_on_duplicate_ids(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.llm.components import (
        token_set_reps,
    )

    rows = [
        (1, "the quick fox"),
        (1, "the quick fox"),  # duplicate id
        (2, "fox quick the"),  # same token set → rep 1
        (3, ""),  # empty token set keeps itself
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = token_set_reps(df, "doc_id", "text", keep_text=True).collect()
    assert len(out) == len(rows), "one output row per input row"
    assert {r.doc_id for r in out} == {1, 2, 3}
    by = {r.doc_id: r.rep_id for r in out}
    assert by[2] == 1 and by[3] == 3
    assert all(hasattr(r, "text") for r in out)

    # parity with the default path on a unique-id source
    uniq = spark.createDataFrame(rows[1:], ["doc_id", "text"])
    a = sorted(
        (r.doc_id, r.rep_id)
        for r in token_set_reps(uniq, "doc_id", "text").collect()
    )
    b = sorted(
        (r.doc_id, r.rep_id)
        for r in token_set_reps(
            uniq, "doc_id", "text", keep_text=True
        ).collect()
    )
    assert a == b


def test_build_time_fingerprint_survives_regeneration_before_first_check(
    tmp_path,
):
    """r10 ADVICE (medium): the marker must hold the fingerprint the
    build was MADE FROM.  Scenario: stale verdict → build → testdata
    regenerated in place with preserved mtimes BEFORE the first
    post-build check.  The old mtime-fallback adoption would bless the
    stale artifact with the NEW source's fingerprint permanently; the
    pending-marker protocol compares the build-time fingerprint and
    correctly invalidates."""
    src = str(tmp_path / "src.parquet")
    art = str(tmp_path / "derived.bin")
    _touch(src, b"generation-one" * 100)
    src_mtime = os.stat(src).st_mtime_ns

    # stale verdict (artifact missing) records the pre-build fp
    assert not artifact_fresh(src, art)
    assert os.path.exists(_marker_path(art) + ".pending")

    # the build lands
    _touch(art, b"derived-from-gen-one")

    # source regenerated IN PLACE with the same mtime, BEFORE any
    # post-build freshness check
    _touch(src, b"generation-TWO" * 100, mtime_ns=src_mtime)

    # first post-build check: build-time fp (gen-one) != current fp
    # (gen-TWO) -> stale, never blessed
    assert not artifact_fresh(src, art), (
        "stale artifact must not be blessed with the new source's "
        "fingerprint"
    )

    # rebuild from gen-TWO; now it is genuinely fresh
    _touch(art, b"derived-from-gen-TWO")
    assert artifact_fresh(src, art)
    # and stays fresh on repeat checks (marker promoted)
    assert artifact_fresh(src, art)


def test_crashed_build_is_conservatively_stale(tmp_path):
    """A pending fingerprint with no newer artifact (builder crashed
    between the stale verdict and the build) must not be promoted —
    the verdict stays stale and the old artifact is never served."""
    src = str(tmp_path / "src.parquet")
    art = str(tmp_path / "derived.bin")
    _touch(art, b"old-artifact")
    import time

    time.sleep(0.01)
    _touch(src, b"newer-source" * 50)

    # stale verdict records pending (artifact older than source)
    assert not artifact_fresh(src, art)
    pending = _marker_path(art) + ".pending"
    assert os.path.exists(pending)
    # ensure the pending file is strictly newer than the artifact
    os.utime(pending, ns=(os.stat(art).st_mtime_ns + 10_000_000,) * 2)

    # no build happened; the next check must stay stale
    assert not artifact_fresh(src, art)
    assert not os.path.exists(_marker_path(art))


def test_dir_source_content_probe_catches_preserved_size_and_mtime(
    tmp_path,
):
    """r10 ADVICE (low): directory-shaped sources must detect a
    same-size same-mtime byte change in a member file — the file-
    source head+tail md5 guarantee now applies to dir sources too."""
    srcdir = tmp_path / "src_table"
    srcdir.mkdir()
    member = str(srcdir / "part-0.parquet")
    _touch(member, b"AAAA" * 256)
    m_mtime = os.stat(member).st_mtime_ns
    art = str(tmp_path / "derived.bin")

    assert not artifact_fresh(str(srcdir), art)
    _touch(art, b"derived")
    assert artifact_fresh(str(srcdir), art)

    # regenerate the member with SAME size and SAME mtime
    _touch(member, b"BBBB" * 256, mtime_ns=m_mtime)
    assert not artifact_fresh(str(srcdir), art), (
        "same-size same-mtime byte change in a dir member must "
        "invalidate"
    )


def test_wide_dir_small_member_byte_change_invalidates(tmp_path):
    """r11 ADVICE item 3: the old probe byte-checked only the 16
    largest members; a same-size same-mtime byte change in a SMALL
    member of a >16-file directory served a stale artifact.  Every
    regular member is probed now."""
    src = str(tmp_path / "srcdir")
    art = str(tmp_path / "derived")
    os.makedirs(src)
    # 20 large members + 1 small one (the 16-largest cap excluded it)
    for i in range(20):
        _touch(os.path.join(src, f"big-{i:02d}.bin"), bytes([i]) * 10000)
    small = os.path.join(src, "small.bin")
    _touch(small, b"aaaa")
    small_mtime = os.stat(small).st_mtime_ns

    os.makedirs(art)
    _touch(os.path.join(art, "part-0"), b"derived")
    assert artifact_fresh(src, art)

    # same size, same mtime, different bytes — in the SMALL member
    _touch(small, b"bbbb", mtime_ns=small_mtime)
    assert not artifact_fresh(src, art), (
        "byte change in a small member of a wide dir must invalidate"
    )


def test_pending_sibling_removed_on_fresh_match(tmp_path):
    """r11 ADVICE item 4: once the marker matches, the adjudicated
    .srcfp.pending sibling must be deleted — a later marker loss must
    NOT promote the ancient pre-build fingerprint (which would force a
    spurious rebuild), and stale-once artifacts must not accumulate
    .pending litter."""
    src = str(tmp_path / "src.parquet")
    art = str(tmp_path / "derived")
    _touch(src, b"generation-one" * 100)

    # stale verdict records the pending fingerprint…
    assert not artifact_fresh(src, art)
    pending = _marker_path(art) + ".pending"
    assert os.path.exists(pending)

    # …build happens, first check promotes pending → marker
    os.makedirs(art)
    _touch(os.path.join(art, "part-0"), b"derived-bytes")
    assert artifact_fresh(src, art)
    assert os.path.exists(_marker_path(art))

    # a later fresh check clears any leftover pending sibling
    _touch(pending, b"ancient-pre-build-fingerprint")
    assert artifact_fresh(src, art)
    assert not os.path.exists(pending), (
        "fresh match must clear the adjudicated pending sibling"
    )

    # marker lost afterwards → legacy mtime fallback, NOT a promotion
    # of the ancient pending (it was deleted); artifact newer than src
    # stays fresh instead of a spurious full rebuild
    os.remove(_marker_path(art))
    assert artifact_fresh(src, art)
