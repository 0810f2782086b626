"""kNN vs brute-force numpy oracle (checkCorrectParallel.cpp:316-326 analog:
kth-distance equality — exact here, since all arithmetic is int64)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pkd_tree_spark import fixtures as FX
from pkd_tree_spark.knn import auto_knn_level, knn


def _kth_oracle(pts: pd.DataFrame, queries: pd.DataFrame, k: int) -> dict[int, int]:
    px = pts[["x0", "x1"]].to_numpy()
    out = {}
    for r in queries.itertuples():
        d2 = ((px - np.array([r.q0, r.q1])) ** 2).sum(axis=1)
        out[r.qid] = int(np.partition(d2, k - 1)[k - 1])
    return out


@pytest.mark.parametrize("which,k", [("uniform", 1), ("uniform", 10), ("varden", 10), ("varden", 100)])
def test_knn_kth_distance(request, which, k):
    idx = request.getfixturevalue(f"index_{which}")
    pts = request.getfixturevalue(f"points_{which}")
    queries = FX.knn_fixtures(16, 2)
    res = knn(idx, queries, k=k, level=auto_knn_level(len(pts), 2)).toPandas()
    got = res[res.rn == k].set_index("qid")["dist2"].to_dict()
    want = _kth_oracle(pts, queries, k)
    assert got == want


def test_knn_ood(index_varden, points_varden):
    """OOD variant (tests/test.cpp:494-509): query points far from the
    clusters — forces multi-round ring expansion through sparse cells."""
    queries = pd.DataFrame({"qid": [0, 1, 2], "q0": [0, 999_999, 500_001], "q1": [0, 999_999, 1]})
    res = knn(index_varden, queries, k=5).toPandas()
    got = res[res.rn == 5].set_index("qid")["dist2"].to_dict()
    want = _kth_oracle(points_varden, queries.rename(columns={"q0": "q0", "q1": "q1"}), 5)
    assert got == want


def test_knn_k_exceeds_candidates_in_home_cell(index_uniform, points_uniform):
    """k larger than any single cell's population — termination must come
    from the ring bound, not luck."""
    queries = FX.knn_fixtures(4, 2)
    k = 200
    res = knn(index_uniform, queries, k=k, level=6).toPandas()
    got = res[res.rn == k].set_index("qid")["dist2"].to_dict()
    assert got == _kth_oracle(points_uniform, queries, k)


def test_knn_duplicate_points_multiset(index_uniform, points_uniform):
    """Duplicate lineitem rows produce duplicate points; they must count as
    distinct neighbors (dummy-leaf multiplicity semantics)."""
    dup_counts = points_uniform.groupby(["x0", "x1"]).size()
    assert (dup_counts > 1).any(), "fixture should contain duplicates"
    x0, x1 = dup_counts[dup_counts > 1].index[0]
    queries = pd.DataFrame({"qid": [0], "q0": [int(x0)], "q1": [int(x1)]})
    res = knn(index_uniform, queries, k=2).toPandas().sort_values("rn")
    assert res.iloc[0]["dist2"] == 0 and res.iloc[1]["dist2"] == 0


def test_knn_offgrid_shell_still_terminates(spark):
    """Regression (r4): a coarse-level boundary query whose round-2+ shell
    falls ENTIRELY off-grid must still finish via the covered-mesh rule.
    r3 broke the round loop when no shell cells survived, silently losing
    still-pending queries (and leaking the persisted empty cells frame)."""
    from pkd_tree_spark.config import EngineConfig
    from pkd_tree_spark.index import SpatialIndex

    cfg = EngineConfig(dims=2, index_level=3, knn_level=1, partitions=4)
    pts = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(5)],
            "span_idx": [0] * 5,
            "key": list(range(5)),
            "x0": [0, 1, 2, 3, 4],
            "x1": [0, 1, 2, 3, 4],
        }
    )
    idx = SpatialIndex.build(spark.createDataFrame(pts), cfg)
    # far-corner query at level 1: round 1 scans the whole 2x2 grid but the
    # kth distance exceeds (r*w)^2, so round 2's shell is fully off-grid
    q = pd.DataFrame({"qid": [0], "q0": [999_999], "q1": [999_999]})
    res = knn(idx, q, k=3, level=1, adaptive=False).toPandas()
    assert len(res) == 3
    assert res.sort_values("rn")["key"].tolist() == [4, 3, 2]
