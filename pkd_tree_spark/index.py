"""Distributed spatial index: Z-order layout + per-cell metadata.

The reference's kd-tree splits into three structural tiers:
  1. top ~6 splitter levels routing to 64 buckets (build_tree.hpp:19-45);
  2. recursive interior nodes;
  3. <=32-point leaves (tree_node.hpp:33-39).

Spark-first mapping (SURVEY.md §2.2):
  1. -> ``repartitionByRange(morton)``: the shuffle IS the blocked counting
     sort of build_tree.hpp:83-121, with reservoir-sampled range bounds
     playing pick_pivots (build_tree.hpp:48-70);
  2. -> the Morton prefix hierarchy (pure bit shifts, no materialized tree);
  3. -> parquet row groups sorted by morton inside each partition, plus a
     small per-cell metadata table (cell, count, per-dim min/max) that
     answers fully-contained subqueries without touching data — the
     containment short-circuit of range_count.hpp:79-80.

At cluster scale the metadata table is itself a DataFrame (broadcastable,
~n/leaf_target rows); covers are computed from query geometry alone
(data-independent), driver-side here, or inside mapInPandas when the query
set is itself large.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import EngineConfig, DEFAULT_CONFIG
from .zorder import morton_col, morton_decode_np, cell_col

__all__ = ["SpatialIndex", "cover_regions"]


@dataclass
class SpatialIndex:
    """points: (doc_id, span_idx, key, x0..x{d-1}, morton) range-partitioned
    and sorted by morton; meta: (cell, cnt, mn0..mx{d-1}) at cfg.index_level.

    ``_ladder`` memoizes the kNN density ladder (density_ladder below) —
    INDEX state, like the reference kd-tree's depth structure, computed at
    most once per index generation (updates produce a new SpatialIndex, so
    the memo invalidates naturally)."""

    points: DataFrame
    meta: DataFrame
    cfg: EngineConfig
    _ladder: tuple[DataFrame, list[int]] | None = None

    def density_ladder(self, target: int = 256) -> tuple[DataFrame, list[int]]:
        """(hist, levels): a (lvl, c, hcnt) point-count histogram over grid
        levels 1..index_level — the skew-adaptivity state for kNN level
        assignment (the kd-tree's density-adaptive depth; divide_rotate's
        data-driven splits, build_tree.hpp:19-45).

        EXACT rollup of the per-cell metadata (meta is ~n/leaf_target rows
        and already persisted — ZERO passes over the points; levels deeper
        than index_level come from the closed-form density formula over the
        meta row's count + occupied bbox, see knn._assign_levels). The
        assignment rule only asks "does the home cell DISQUALIFY this rung"
        (estimate above the candidate target); cells at/below the target
        behave exactly like absent rows in the left join, so the histogram
        keeps ONLY dense cells — small and always broadcastable.

        Computed once per index (eager localCheckpoint), memoized — the
        memo keeps the FIRST call's target; later calls with a smaller
        target may land one rung coarser (a performance nuance only:
        kNN level choices never affect exactness, the ring bound does).
        """
        if self._ladder is not None:
            return self._ladder
        cfg = self.cfg
        d, L = cfg.dims, cfg.index_level

        coarse_levels = list(range(1, L + 1))
        lvl_cells = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lvl).cast("int").alias("lvl"),
                        (
                            F.shiftrightunsigned("cell", d * (L - lvl))
                            if lvl < L
                            else F.col("cell")
                        ).alias("c"),
                    )
                    for lvl in coarse_levels
                ]
            )
        ).alias("s")
        keep_floor = max(0, target // (3**d))
        hist = (
            self.meta.select(lvl_cells, "cnt")
            .select(F.col("s.lvl").alias("lvl"), F.col("s.c").alias("c"), "cnt")
            .groupBy("lvl", "c")
            .agg(F.sum("cnt").alias("hcnt"))
            .where(F.col("hcnt") > keep_floor)
            .localCheckpoint(eager=True)
        )
        self._ladder = (hist, coarse_levels)
        return self._ladder

    @classmethod
    def build(cls, points_df: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG, persist: bool = True) -> "SpatialIndex":
        d = cfg.dims
        xcols = [f"x{j}" for j in range(d)]
        gcols = [F.shiftrightunsigned(F.col(c), cfg.coord_shift) for c in xcols]
        pts = points_df.withColumn("morton", morton_col(gcols, d, cfg.grid_bits))
        # The one index-build shuffle (reference: the counting-sort partition,
        # build_tree.hpp:83-121). Range partitioning keeps cells contiguous
        # per partition -> parquet min/max stats on morton give file skipping.
        pts = pts.repartitionByRange(cfg.partitions, "morton").sortWithinPartitions("morton")
        if persist:
            pts = pts.persist()
        meta = (
            pts.groupBy(cell_col(F.col("morton"), d, cfg.index_level, cfg.grid_bits).alias("cell"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[F.min(c).alias(f"mn{j}") for j, c in enumerate(xcols)],
                *[F.max(c).alias(f"mx{j}") for j, c in enumerate(xcols)],
            )
        )
        if persist:
            meta = meta.persist()
        return cls(points=pts, meta=meta, cfg=cfg)

    # -- introspection / invariants (validate() analog, validation.hpp:49-70)
    def validate(self) -> dict:
        d = self.cfg.dims
        n_pts = self.points.count()
        m = self.meta.agg(F.sum("cnt").alias("s"), F.count(F.lit(1)).alias("cells")).collect()[0]
        # every point's coords inside its cell's geometric bounds
        w = self.cfg.cell_width
        viol: int | None = 0
        mrows = self.meta.collect() if m["cells"] < 200_000 else None
        if mrows is None:
            viol = None  # too many cells for a driver-side check: report "not checked", never a silent 0
        else:
            cells = np.array([r["cell"] for r in mrows], dtype=np.int64)
            gcoords = morton_decode_np(cells, d, bits=self.cfg.index_level)
            for j in range(d):
                mn = np.array([r[f"mn{j}"] for r in mrows])
                mx = np.array([r[f"mx{j}"] for r in mrows])
                viol += int(np.sum((mn < gcoords[:, j] * w) | (mx > (gcoords[:, j] + 1) * w - 1)))
        return {
            "n_points": n_pts,
            "meta_sum": m["s"],
            "n_cells": m["cells"],
            "bbox_violations": viol,
            "bbox_checked": viol is not None,
        }


class _Region:
    """Geometry predicates for cover_regions. ``classify_batch`` takes the
    per-cell bounds arrays lo, hi of shape (m, d) and returns an (m,) int
    array of DISJOINT/PARTIAL/CONTAINED — fully vectorized, the cover
    descent never touches cells one by one."""

    DISJOINT, PARTIAL, CONTAINED = 0, 1, 2

    def classify_batch(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class BoxRegion(_Region):
    def __init__(self, qlo, qhi):
        self.qlo = np.asarray(qlo, dtype=np.int64)
        self.qhi = np.asarray(qhi, dtype=np.int64)

    def classify_batch(self, lo, hi):
        disjoint = ((hi < self.qlo) | (lo > self.qhi)).any(axis=1)
        contained = ((lo >= self.qlo) & (hi <= self.qhi)).all(axis=1)
        return np.where(disjoint, self.DISJOINT, np.where(contained, self.CONTAINED, self.PARTIAL))


class BallRegion(_Region):
    """Exact int arithmetic: squared distances (circle predicates,
    utility/box_op.hpp:91-134)."""

    def __init__(self, center, r2: int):
        self.c = np.asarray(center, dtype=np.int64)
        self.r2 = int(r2)

    def classify_batch(self, lo, hi):
        nearest = np.clip(self.c, lo, hi)
        dmin2 = ((nearest - self.c) ** 2).sum(axis=1)
        farthest = np.where(np.abs(lo - self.c) > np.abs(hi - self.c), lo, hi)
        dmax2 = ((farthest - self.c) ** 2).sum(axis=1)
        return np.where(dmin2 > self.r2, self.DISJOINT, np.where(dmax2 <= self.r2, self.CONTAINED, self.PARTIAL))


class ConvexPolygonRegion(_Region):
    """CCW convex polygon, d=2 only. Separating-axis classification."""

    def __init__(self, verts: np.ndarray):
        self.v = np.asarray(verts, dtype=np.int64)  # (e, 2)
        self.e = np.roll(self.v, -1, axis=0) - self.v  # edges

    def classify_batch(self, lo, hi):
        m = lo.shape[0]
        # corners: (m, 4, 2)
        corners = np.stack(
            [
                np.stack([lo[:, 0], lo[:, 1]], axis=1),
                np.stack([lo[:, 0], hi[:, 1]], axis=1),
                np.stack([hi[:, 0], lo[:, 1]], axis=1),
                np.stack([hi[:, 0], hi[:, 1]], axis=1),
            ],
            axis=1,
        )
        # cross((v1-v0),(p-v0)): (e, m, 4)
        rel = corners[None, :, :, :] - self.v[:, None, None, :]
        cross = self.e[:, None, None, 0] * rel[:, :, :, 1] - self.e[:, None, None, 1] * rel[:, :, :, 0]
        contained = (cross >= 0).all(axis=(0, 2))
        disjoint = (cross < 0).all(axis=2).any(axis=0)  # box fully outside one edge
        # polygon-box SAT on the box axes
        vx, vy = self.v[:, 0], self.v[:, 1]
        disjoint |= (vx[None, :] < lo[:, [0]]).all(axis=1) | (vx[None, :] > hi[:, [0]]).all(axis=1)
        disjoint |= (vy[None, :] < lo[:, [1]]).all(axis=1) | (vy[None, :] > hi[:, [1]]).all(axis=1)
        return np.where(disjoint, self.DISJOINT, np.where(contained, self.CONTAINED, self.PARTIAL))


def cover_regions(
    regions: list[tuple[int, _Region]],
    cfg: EngineConfig = DEFAULT_CONFIG,
    budget: int = 512,
) -> pd.DataFrame:
    """Hierarchical cell cover per query region (data-independent).

    Returns DataFrame columns (qid, level, cell, interior) where cells are
    pairwise disjoint per qid; ``interior`` cells are fully inside the
    region (answered from metadata counts alone — the `within_box ->
    T->size` shortcut, range_count.hpp:79-80), boundary cells need an exact
    row filter. Level-synchronous quadtree descent, vectorized over the
    whole frontier per query, with a budget: once the emitted+frontier size
    would exceed ``budget`` cells, remaining PARTIAL cells are emitted as
    boundary at their current level (correct, just scans a few more rows).

    At cluster scale with millions of queries this same function runs
    inside mapInPandas over the query DataFrame (it is data-independent and
    embarrassingly parallel per query); driver-side suffices for the
    benchmark query counts.
    """
    d, L, cb = cfg.dims, cfg.index_level, cfg.coord_bits
    child_offsets = np.arange(1 << d, dtype=np.int64)
    q_out, l_out, c_out, i_out = [], [], [], []

    def emit(qid: int, level: int, cells: np.ndarray, interior: bool):
        if cells.size == 0:
            return
        q_out.append(np.full(cells.size, qid, dtype=np.int64))
        l_out.append(np.full(cells.size, level, dtype=np.int32))
        c_out.append(cells)
        i_out.append(np.full(cells.size, interior, dtype=bool))

    for qid, region in regions:
        cells = np.zeros(1, dtype=np.int64)  # the level-0 root cell
        emitted = 0
        for level in range(L + 1):
            if cells.size == 0:
                break
            g = morton_decode_np(cells, d, bits=level) if level else np.zeros((1, d), dtype=np.int64)
            w = 1 << (cb - level)
            lo = g * w
            hi = lo + (w - 1)
            cls = region.classify_batch(lo, hi)
            cont = cells[cls == _Region.CONTAINED]
            emit(qid, level, cont, True)
            emitted += cont.size
            partial = cells[cls == _Region.PARTIAL]
            if level == L or emitted + partial.size * (1 << d) > budget:
                emit(qid, level, partial, False)
                break
            cells = ((partial[:, None] << d) | child_offsets[None, :]).reshape(-1)
    if not q_out:
        return pd.DataFrame(columns=["qid", "level", "cell", "interior"]).astype(
            {"qid": "int64", "level": "int32", "cell": "int64", "interior": "bool"}
        )
    return pd.DataFrame(
        {
            "qid": np.concatenate(q_out),
            "level": np.concatenate(l_out),
            "cell": np.concatenate(c_out),
            "interior": np.concatenate(i_out),
        }
    )
