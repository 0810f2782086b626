"""Batch insert/delete, skew/retile, sliding window, persistence + lineage
(reference: tests/test.cpp:53-74 insert/delete harness; testFramework.h
:209-254 incremental build; :817-869 sliding window)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pkd_tree_spark import fixtures as FX
from pkd_tree_spark.documents import load_points
from pkd_tree_spark.index import SpatialIndex
from pkd_tree_spark.ranges import range_count_boxes
from pkd_tree_spark.updates import (
    Checkpoint,
    PersistentIndex,
    check_skew,
    merge_delete,
    merge_insert,
    retile,
    sliding_window,
)
from tests.conftest import SF_DIR

BOXES = FX.box_fixtures(8, 2)


def _counts(idx) -> dict:
    return range_count_boxes(idx, BOXES).toPandas().set_index("qid")["cnt"].to_dict()


def _box_oracle(pts: pd.DataFrame) -> dict:
    out = {}
    for r in BOXES.itertuples():
        m = (pts.x0 >= r.lo0) & (pts.x0 <= r.hi0) & (pts.x1 >= r.lo1) & (pts.x1 <= r.hi1)
        out[r.qid] = int(m.sum())
    return out


def test_insert_then_delete_roundtrip(spark, cfg, index_uniform, points_uniform):
    batch_pd = points_uniform.head(500).copy()
    batch_pd["key"] = batch_pd["key"] + 90_000_000
    batch_pd["doc_id"] = "ins_" + batch_pd["key"].astype(str)
    batch = spark.createDataFrame(batch_pd)

    idx2 = merge_insert(index_uniform, batch)
    v = idx2.validate()
    assert v["n_points"] == len(points_uniform) + 500
    assert v["meta_sum"] == v["n_points"]
    assert _counts(idx2) == _box_oracle(pd.concat([points_uniform, batch_pd]))

    idx3 = merge_delete(idx2, batch.select("key"))
    v3 = idx3.validate()
    assert v3["n_points"] == len(points_uniform)
    assert v3["meta_sum"] == v3["n_points"]
    assert _counts(idx3) == _box_oracle(points_uniform)


def test_partial_cover_delete_is_noop_for_absent_keys(spark, index_uniform, points_uniform):
    """PartialCover semantics (batch_delete.hpp:93-107): absent keys ignored."""
    ghost = spark.createDataFrame(pd.DataFrame({"key": [123_456_789, 987_654_321]}))
    idx2 = merge_delete(index_uniform, ghost)
    assert idx2.points.count() == len(points_uniform)


def test_incremental_build_steps(spark, cfg, points_uniform):
    """U7: insert in steps until full; final state equals a fresh build."""
    pts = load_points(spark, SF_DIR, dims=2, dist="uniform")
    idx = SpatialIndex.build(pts.where(F.col("key") % 4 == 0), cfg)
    for step in (1, 2, 3):
        idx = merge_insert(idx, pts.where(F.col("key") % 4 == step))
    assert idx.points.count() == len(points_uniform)
    assert _counts(idx) == _box_oracle(points_uniform)


def test_sliding_window(spark, cfg, points_uniform):
    pts = load_points(spark, SF_DIR, dims=2, dist="uniform")
    period = F.col("key") % 10
    idx = SpatialIndex.build(pts.where(F.lit(False)), cfg)
    batches = [pts.where(period == t) for t in range(10)]
    seen = []
    idx = sliding_window(idx, batches, window_len=5, on_step=lambda t, i: seen.append(t))
    assert seen == list(range(10))
    live = points_uniform[points_uniform.key % 10 >= 5]
    assert idx.points.count() == len(live)
    assert _counts(idx) == _box_oracle(live)


def test_skew_detect_and_retile(spark, points_uniform):
    from pkd_tree_spark.config import EngineConfig

    cfg = EngineConfig(dims=2, index_level=2, knn_level=2, partitions=4, leaf_target=16)
    idx = SpatialIndex.build(spark.createDataFrame(points_uniform), cfg)
    s = check_skew(idx)
    assert s["needs_retile"]  # leaf_target=16 with thousands of rows/cell
    idx2 = retile(idx)
    assert idx2.validate()["meta_sum"] == len(points_uniform)
    assert _counts(idx2) == _box_oracle(points_uniform)


def test_persistent_index_and_lineage(tmp_path, spark, cfg, index_uniform, points_uniform):
    p = PersistentIndex(path=str(tmp_path / "idx"), cfg=cfg)
    p.write(index_uniform)
    # lineage markers exist -> a second write is a resume no-op
    ck = Checkpoint(str(tmp_path / "idx/_lineage"))
    assert ck.has("write_points") and ck.has("write_meta")
    before = ck.info("write_points")
    p.write(index_uniform)
    assert ck.info("write_points") == before  # not recomputed

    loaded = p.load(spark)
    assert loaded.points.count() == len(points_uniform)
    assert _counts(loaded) == _box_oracle(points_uniform)


def test_cow_merge_rewrites_only_touched_buckets(tmp_path, spark, cfg, index_uniform, points_uniform):
    p = PersistentIndex(path=str(tmp_path / "idx"), cfg=cfg)
    p.write(index_uniform)
    # batch confined to one corner -> one bucket touched
    batch = pd.DataFrame(
        {
            "doc_id": [f"ins_{i}" for i in range(10)],
            "span_idx": [0] * 10,
            "key": [80_000_000 + i for i in range(10)],
            "x0": list(range(10)),
            "x1": list(range(10)),
        }
    )
    p.merge_insert_cow(spark, spark.createDataFrame(batch))
    ck = Checkpoint(str(tmp_path / "idx/_lineage_merge"))
    done = [f for f in __import__("os").listdir(ck.path) if f.startswith("merge_bucket_")]
    assert len(done) == 1  # copy-on-write granularity
    loaded = p.load(spark)
    assert loaded.points.count() == len(points_uniform) + 10


def test_cow_meta_refresh_reads_only_touched_buckets(
    tmp_path, spark, cfg, index_uniform, points_uniform
):
    """The meta refresh after a COW merge must be TARGETED: only touched
    buckets' point files are read (partition pruning), untouched cells'
    meta rows are carried over verbatim. Proven behaviorally: delete an
    UNTOUCHED bucket's data files before the merge — a full-table refresh
    would silently drop that bucket's meta rows (or fail); the targeted
    refresh never reads it, so its meta rows survive unchanged."""
    import os
    import shutil

    p = PersistentIndex(path=str(tmp_path / "idx"), cfg=cfg)
    p.write(index_uniform)
    meta_before = spark.read.parquet(p.meta_path).toPandas().set_index("cell").sort_index()

    batch = pd.DataFrame(
        {
            "doc_id": [f"ins_{i}" for i in range(10)],
            "span_idx": [0] * 10,
            "key": [90_000_000 + i for i in range(10)],
            "x0": list(range(10)),
            "x1": list(range(10)),  # corner -> pbucket 0 only
        }
    )
    # remove a far-away bucket's files entirely (untouched by the batch)
    bucket_dirs = sorted(
        d for d in os.listdir(p.points_path) if d.startswith("pbucket=") and d != "pbucket=0"
    )
    victim = bucket_dirs[-1]
    victim_bucket = int(victim.split("=")[1])
    shutil.rmtree(os.path.join(p.points_path, victim))

    p.merge_insert_cow(spark, spark.createDataFrame(batch))

    meta_after = spark.read.parquet(p.meta_path).toPandas().set_index("cell").sort_index()
    d, shift = cfg.dims, cfg.dims * (cfg.index_level - p.bucket_level)
    # the deleted (untouched) bucket's cells are still present, bit-for-bit
    victim_cells = [c for c in meta_before.index if (c >> shift) == victim_bucket]
    assert victim_cells, "fixture should occupy the victim bucket"
    pd.testing.assert_frame_equal(
        meta_after.loc[victim_cells], meta_before.loc[victim_cells], check_like=True
    )
    # the touched bucket's counts reflect the insert
    touched_cells = [c for c in meta_after.index if (c >> shift) == 0]
    assert (
        meta_after.loc[touched_cells, "cnt"].sum()
        == meta_before.loc[[c for c in meta_before.index if (c >> shift) == 0], "cnt"].sum() + 10
    )
