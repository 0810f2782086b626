"""Range count/report vs brute-force pandas oracle (the CGAL-differential
role of tests/checkCorrectParallel.cpp:327-366)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pkd_tree_spark import fixtures as FX
from pkd_tree_spark.ranges import (
    range_count_balls,
    range_count_boxes,
    range_count_polygons,
    range_report_boxes,
)

NQ = 24


def _box_oracle(pts: pd.DataFrame, boxes: pd.DataFrame) -> pd.Series:
    out = {}
    for r in boxes.itertuples():
        m = (
            (pts.x0 >= r.lo0) & (pts.x0 <= r.hi0) & (pts.x1 >= r.lo1) & (pts.x1 <= r.hi1)
        )
        out[r.qid] = int(m.sum())
    return pd.Series(out)


@pytest.mark.parametrize("which", ["uniform", "varden"])
def test_range_count_box(request, which):
    idx = request.getfixturevalue(f"index_{which}")
    pts = request.getfixturevalue(f"points_{which}")
    boxes = FX.box_fixtures(NQ, 2)
    got = range_count_boxes(idx, boxes).toPandas().set_index("qid")["cnt"].sort_index()
    want = _box_oracle(pts, boxes).sort_index()
    assert got.to_dict() == want.to_dict()


def test_range_count_ball(index_uniform, points_uniform):
    balls = FX.ball_fixtures(NQ, 2)
    got = range_count_balls(index_uniform, balls).toPandas().set_index("qid")["cnt"].sort_index()
    want = {}
    for r in balls.itertuples():
        d2 = (points_uniform.x0 - r.c0) ** 2 + (points_uniform.x1 - r.c1) ** 2
        want[r.qid] = int((d2 <= r.r2).sum())
    assert got.to_dict() == want


def test_range_report_multiset(index_uniform, points_uniform):
    """Sorted result multiset per box, as checkCorrectParallel.cpp:337-366."""
    boxes = FX.box_fixtures(8, 2)
    got = range_report_boxes(index_uniform, boxes).toPandas()
    for r in boxes.itertuples():
        m = (
            (points_uniform.x0 >= r.lo0)
            & (points_uniform.x0 <= r.hi0)
            & (points_uniform.x1 >= r.lo1)
            & (points_uniform.x1 <= r.hi1)
        )
        want = points_uniform[m][["key", "x0", "x1"]].sort_values(["key", "x0", "x1"]).reset_index(drop=True)
        g = got[got.qid == r.qid][["key", "x0", "x1"]].sort_values(["key", "x0", "x1"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, want)


def test_polygon_count_vs_l1(index_uniform, points_uniform):
    """Diamond polygons == L1 balls: generic convex machinery vs direct L1."""
    polys = FX.diamond_fixtures(NQ)
    got = (
        range_count_polygons(index_uniform, polys[["qid", "vx", "vy"]])
        .toPandas()
        .set_index("qid")["cnt"]
        .sort_index()
    )
    want = {}
    for r in polys.itertuples():
        l1 = (points_uniform.x0 - r.c0).abs() + (points_uniform.x1 - r.c1).abs()
        want[r.qid] = int((l1 <= r.r).sum())
    assert got.to_dict() == want


def test_empty_and_total_boxes(index_uniform, points_uniform):
    boxes = pd.DataFrame(
        {
            "qid": [0, 1],
            "lo0": [2_000_000, 0],
            "lo1": [2_000_000, 0],
            "hi0": [3_000_000, 1_000_000],
            "hi1": [3_000_000, 1_000_000],
        }
    )
    got = range_count_boxes(index_uniform, boxes).toPandas().set_index("qid")["cnt"]
    assert got[0] == 0
    assert got[1] == len(points_uniform)


def test_distributed_covers_match_driver_side(spark):
    """The mapInPandas cover path (used for large query batches) must
    produce exactly the driver-side covers."""
    from pkd_tree_spark.config import EngineConfig
    from pkd_tree_spark.index import cover_regions
    from pkd_tree_spark.ranges import _box_regions, _covers_distributed

    cfg = EngineConfig(dims=2, index_level=5, knn_level=4, partitions=4)
    boxes = FX.box_fixtures(50, 2)
    want = (
        cover_regions(_box_regions(boxes, 2), cfg, 256)
        .sort_values(["qid", "level", "cell"])
        .reset_index(drop=True)
    )
    got = (
        _covers_distributed(spark, boxes, "box", cfg, 256)  # now a DataFrame (never collected in prod)
        .toPandas()
        .sort_values(["qid", "level", "cell"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_large_batch_count_uses_dataframe_covers(index_uniform, points_uniform):
    """Above DISTRIBUTED_COVER_THRESHOLD the covers feed the cell joins as a
    DataFrame — never collected — and counts still match the small-batch
    (driver-side covers) plan on the same queries."""
    from pkd_tree_spark import ranges as R

    nq = R.DISTRIBUTED_COVER_THRESHOLD + 200
    boxes = FX.box_fixtures(nq, 2)
    big = range_count_boxes(index_uniform, boxes).toPandas().set_index("qid")["cnt"]
    # force the driver-side path on a subset and compare
    sub = boxes.head(64)
    small = range_count_boxes(index_uniform, sub).toPandas().set_index("qid")["cnt"]
    assert (big.loc[small.index] == small).all()
