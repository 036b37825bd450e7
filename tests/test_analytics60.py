from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics60 import (
    POLYGONS,
    inside_sql,
    q_char_ioc,
    q_point_in_polygon,
)

SF0001 = "/root/testdata/sf0.001"


def _inside_even_odd(x: float, y: float, verts: list[tuple[int, int]]) -> bool:
    """Independent float-division ray-cast (the textbook form with the
    division NOT cleared), same boundary convention (yl <= y < yu,
    strict x-left)."""
    inside = False
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if y1 == y2:
            continue
        (xl, yl), (xu, yu) = ((x1, y1), (x2, y2)) if y1 < y2 else ((x2, y2), (x1, y1))
        if yl <= y < yu and x < xl + (xu - xl) * (y - yl) / (yu - yl):
            inside = not inside
    return inside


def _crossings_int(x: int, y: int, verts: list[tuple[int, int]]) -> int:
    """The cleared-denominator integer formulation the query uses."""
    c = 0
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if y1 == y2:
            continue
        (xl, yl), (xu, yu) = ((x1, y1), (x2, y2)) if y1 < y2 else ((x2, y2), (x1, y1))
        if yl <= y < yu and (x - xl) * (yu - yl) < (xu - xl) * (y - yl):
            c += 1
    return c


def _on_any_edge_line(x: int, y: int, verts: list[tuple[int, int]]) -> bool:
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (x - x1) * (y2 - y1) == (x2 - x1) * (y - y1):
            return True
    return False


def test_integer_formulation_matches_float_ray_cast():
    # dense lattice sweep, pure Python; skip points exactly on an edge
    # line where float vs integer tie-breaking may legitimately differ
    kept = 0
    for name, verts in POLYGONS.items():
        for x in range(3, 1000, 7):
            for y in range(5, 1000, 11):
                if _on_any_edge_line(x, y, verts):
                    continue
                kept += 1
                assert (_crossings_int(x, y, verts) % 2 == 1) == _inside_even_odd(
                    float(x), float(y), verts
                ), (name, x, y)
    assert kept > 30000


def test_point_in_polygon_concave_holes():
    # hand-picked witnesses for the concave l_shape: the notch
    # (x>300, y>700) is OUTSIDE even though its bounding box is inside
    verts = POLYGONS["l_shape"]
    cases = {
        (200, 600): True,  # lower arm
        (200, 850): True,  # upper arm
        (400, 600): True,  # lower arm, right half
        (400, 800): False,  # the notch
        (50, 600): False,  # left of everything
        (500, 600): False,  # right of the lower arm
    }
    for (x, y), want in cases.items():
        assert (_crossings_int(x, y, verts) % 2 == 1) is want, (x, y)
        assert _inside_even_odd(float(x), float(y), verts) is want, (x, y)


def test_spark_expression_matches_integer_formulation(spark):
    # one bulk evaluation of the generated SQL over a coarse lattice
    grid = spark.range(0, 1600).selectExpr(
        "CAST((id % 40) * 25 + 3 AS BIGINT) AS x",
        "CAST((id DIV 40) * 25 + 5 AS BIGINT) AS y",
    )
    exprs = [inside_sql("x", "y", v) + f" AS in_{n}" for n, v in POLYGONS.items()]
    rows = grid.selectExpr("x", "y", *exprs).collect()
    assert len(rows) == 1600
    for r in rows:
        for name, verts in POLYGONS.items():
            assert r[f"in_{name}"] == (
                _crossings_int(r["x"], r["y"], verts) % 2 == 1
            ), (name, r["x"], r["y"])


def test_point_in_polygon_counts(spark):
    rows = {r["poly_id"]: r for r in q_point_in_polygon(spark, SF0001).collect()}
    assert set(rows) == set(POLYGONS)

    pts = [
        (
            r["c_custkey"],
            (r["c_custkey"] * 48271) % 1000,
            (r["c_custkey"] * 16807) % 1000,
        )
        for r in load(spark, SF0001, "customer").select("c_custkey").collect()
    ]
    any_inside = False
    for name, verts in POLYGONS.items():
        ins = [k for k, x, y in pts if _crossings_int(x, y, verts) % 2 == 1]
        any_inside = any_inside or bool(ins)
        assert rows[name]["n_inside"] == len(ins), name
        assert rows[name]["key_checksum"] == sum(ins), name
    assert any_inside  # the lattice derivation actually hits the fences


def test_char_ioc_matches_counter(spark):
    got = {r["doc_id"]: r for r in q_char_ioc(spark, SF0001).collect()}
    docs = load(spark, SF0001, "documents").select("doc_id", "text").collect()
    checked = 0
    for r in docs:
        text = r["text"]
        if text is None or len(text) < 2:
            assert r["doc_id"] not in got
            continue
        c = Counter(text)
        n = len(text)
        coll = sum(v * (v - 1) for v in c.values())
        row = got[r["doc_id"]]
        assert row["len_chars"] == n
        assert row["distinct_chars"] == len(c)
        assert row["top_char_count"] == max(c.values())
        assert row["coll_num"] == coll
        assert row["ioc"] == coll / (n * (n - 1))
        checked += 1
    assert checked > 0 and checked == len(got)
