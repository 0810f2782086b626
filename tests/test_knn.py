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


# ---------------------------------------------------------------------------
# round 5: large-meta Spark-side resolution, duplicate collapse, empty index
# ---------------------------------------------------------------------------

_RESCOLS = ["qid", "rn", "key", "span_idx", "dist2"]


def _sorted(res) -> pd.DataFrame:
    return res.toPandas().sort_values(["qid", "rn"]).reset_index(drop=True)[_RESCOLS]


def test_knn_large_meta_fallback_no_points_explode(spark, cfg, index_uniform, points_uniform):
    """When the meta exceeds the driver memo (META_MEMO_CELLS), kNN must
    resolve shells via the meta-side join — NOT revert to the full points
    explode (VERDICT r4 'What's wrong' #2). Coarse shells resolve to
    lvl==-1 leaf rows, which take the no-generate leaf equi-join."""
    from pkd_tree_spark.documents import load_points
    from pkd_tree_spark.index import SpatialIndex

    idx = SpatialIndex.build(load_points(spark, "/root/testdata/sf0.001", dims=2, dist="uniform"), cfg)
    object.__setattr__(idx, "_meta_np", {"cells": None})  # memo refusal
    assert idx.meta_np() is None
    queries = FX.knn_fixtures(16, 2)
    plans: list = []
    got = _sorted(knn(idx, queries, k=10, level=4, adaptive=False, plan_log=plans))
    want = _sorted(knn(index_uniform, queries, k=10, level=4, adaptive=False))
    pd.testing.assert_frame_equal(got, want)
    assert plans, "plan probe should capture at least one round"
    for p in plans:
        # every resolved shell cell is a leaf row (lvl==-1): the candidate
        # join is the single-scan leaf equi-join, no points-side explode
        assert set(p["lvl_counts"]) <= {-1}, p["lvl_counts"]


def test_knn_large_meta_fallback_adaptive(spark, cfg, index_varden):
    """Adaptive (mixed coarse/fine level) queries through the Spark-side
    resolution path must match the memoized path exactly."""
    from pkd_tree_spark.documents import load_points
    from pkd_tree_spark.index import SpatialIndex

    idx = SpatialIndex.build(load_points(spark, "/root/testdata/sf0.001", dims=2, dist="varden"), cfg)
    object.__setattr__(idx, "_meta_np", {"cells": None})
    queries = FX.knn_fixtures(16, 2)
    got = _sorted(knn(idx, queries, k=10))
    want = _sorted(knn(index_varden, queries, k=10))
    pd.testing.assert_frame_equal(got, want)


def test_knn_pruned_duplicate_collapse(spark, cfg):
    """Dummy-leaf duplicate collapse (build_tree.hpp:183-186): on a
    duplicate-heavy lattice the pruned candidate table must engage, shrink
    the scan, and stay multiset-exact vs the raw path — including after a
    cap upgrade (second call with larger k rebuilds the pruned table)."""
    from pyspark.sql import functions as F
    from pkd_tree_spark.documents import load_points
    from pkd_tree_spark.index import SpatialIndex

    pts = load_points(spark, "/root/testdata/sf0.001", dims=2, dist="uniform")
    lattice = pts.select(
        "doc_id", "span_idx", "key",
        *[(F.col(f"x{j}") % 10 * 99_991).alias(f"x{j}") for j in range(2)],
    )
    idx = SpatialIndex.build(lattice, cfg)
    raw = SpatialIndex.build(lattice, cfg)
    object.__setattr__(raw, "_pruned", "refused")
    queries = FX.knn_fixtures(16, 2)
    got = _sorted(knn(idx, queries, k=10))
    assert isinstance(idx._pruned, tuple), "pruned table should engage on the lattice"
    n_full, n_pruned = idx.points.count(), idx._pruned[0].count()
    assert n_pruned < n_full
    # the collapse must be the JVM window form with the map-side partial
    # top-cap (r5's Arrow pass pd.concat'ed whole partitions and
    # anti-scaled); Partial = at most cap rows per position cross the
    # exchange, since duplicate groups are partition-local after build
    plan = idx._pruned[0]._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
    pd.testing.assert_frame_equal(got, _sorted(knn(raw, queries, k=10)))
    # cap upgrade: k=20 > PRUNE_CAP_MIN forces a rebuild with cap=20
    got20 = _sorted(knn(idx, queries, k=20))
    assert idx._pruned[1] >= 20
    pd.testing.assert_frame_equal(got20, _sorted(knn(raw, queries, k=20)))


def test_knn_empty_index_fine_level(spark, cfg):
    """ADVICE r4 (knn.py:323): a query at level > index_level against an
    EMPTY index must produce zero rows, not IndexError inside mapInPandas."""
    from pyspark.sql import functions as F
    from pkd_tree_spark.documents import load_points
    from pkd_tree_spark.index import SpatialIndex

    pts = load_points(spark, "/root/testdata/sf0.001", dims=2, dist="uniform")
    empty = SpatialIndex.build(pts.where(F.lit(False)), cfg)
    res = knn(empty, FX.knn_fixtures(4, 2), k=3, level=cfg.index_level + 2, adaptive=False)
    assert res.count() == 0


def test_knn_driver_loop_window_reduction_matches_raw(index_varden, monkeypatch):
    """r7 driver ring loop: rounds whose estimated candidate volume exceeds
    DRIVER_COLLECT_MAX_ROWS reduce per-query top-k in Spark before the
    collect. Forcing the reduction (cap=0 after the exact-count downgrade
    is also disabled) must give byte-identical results to the raw path."""
    import pkd_tree_spark.knn as K

    queries = FX.knn_fixtures(16, 2)
    want = _sorted(knn(index_varden, queries, k=10))
    monkeypatch.setattr(K, "DRIVER_COLLECT_MAX_ROWS", 0)
    got = _sorted(knn(index_varden, queries, k=10))
    pd.testing.assert_frame_equal(got, want)


def test_knn_spark_vs_driver_loop_equivalence(spark, cfg, index_uniform):
    """The small-batch driver loop and the distributed loop must return the
    same rows AND the same per-query (rounds, cand_rows) stats."""
    import pkd_tree_spark.knn as K

    queries = FX.knn_fixtures(32, 2)
    res_a, st_a = knn(index_uniform, queries, k=10, return_stats=True)
    a, sa = _sorted(res_a), st_a.toPandas().sort_values("qid").reset_index(drop=True)
    import unittest.mock as mock

    with mock.patch.object(K, "DRIVER_CELLS_MAX_QUERIES", -1):
        res_b, st_b = knn(index_uniform, queries, k=10, return_stats=True)
        b, sb = _sorted(res_b), st_b.toPandas().sort_values("qid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(sa, sb)


def test_knn_cells_join_over_gate_equivalence(spark, cfg, index_varden):
    """r7: cell relations over CELLS_BCAST_ROWS take a shuffled join
    instead of a driver-built broadcast (the broadcast relation build is
    serial and was the 38.4M varden round-1 bottleneck). Forcing the
    shuffled path at a tiny size must give byte-identical rows AND stats
    to the broadcast path."""
    import unittest.mock as mock

    import pkd_tree_spark.knn as K

    queries = FX.knn_fixtures(32, 2)
    with mock.patch.object(K, "DRIVER_CELLS_MAX_QUERIES", -1):
        res_a, st_a = knn(index_varden, queries, k=10, return_stats=True)
        a, sa = _sorted(res_a), st_a.toPandas().sort_values("qid").reset_index(drop=True)
        with mock.patch.object(K, "CELLS_BCAST_ROWS", 0):
            res_b, st_b = knn(index_varden, queries, k=10, return_stats=True)
            b, sb = _sorted(res_b), st_b.toPandas().sort_values("qid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(sa, sb)
