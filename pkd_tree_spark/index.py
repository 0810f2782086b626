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
    and sorted by morton; meta: (cell, cnt, mn0..mx{d-1}) at cfg.index_level."""

    points: DataFrame
    meta: DataFrame
    cfg: EngineConfig

    @classmethod
    def build(cls, points_df: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG, persist: bool = True) -> "SpatialIndex":
        d = cfg.dims
        xcols = [f"x{j}" for j in range(d)]
        pts = points_df.withColumn("morton", morton_col([F.col(c) for c in xcols], d, cfg.grid_bits))
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
        viol = 0
        mrows = self.meta.collect() if m["cells"] < 200_000 else None
        if mrows is not None:
            cells = np.array([r["cell"] for r in mrows], dtype=np.int64)
            gcoords = morton_decode_np(cells, d, bits=self.cfg.index_level)
            for j in range(d):
                mn = np.array([r[f"mn{j}"] for r in mrows])
                mx = np.array([r[f"mx{j}"] for r in mrows])
                viol += int(np.sum((mn < gcoords[:, j] * w) | (mx >= (gcoords[:, j] + 1) * w)))
        return {"n_points": n_pts, "meta_sum": m["s"], "n_cells": m["cells"], "bbox_violations": viol}


def _cell_bounds(cell: int, level: int, d: int, grid_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Geometric [lo, hi) bounds (in coordinate units) of a level-`level` cell."""
    g = morton_decode_np(np.array([cell], dtype=np.int64), d, bits=level)[0]
    w = 1 << (grid_bits - level)
    lo = g * w
    return lo, lo + w - 1  # inclusive hi


class _Region:
    """Geometry predicates for cover_regions: classify a cell box."""

    DISJOINT, PARTIAL, CONTAINED = 0, 1, 2

    def classify(self, lo: np.ndarray, hi: np.ndarray) -> int:  # pragma: no cover
        raise NotImplementedError


class BoxRegion(_Region):
    def __init__(self, qlo, qhi):
        self.qlo = np.asarray(qlo, dtype=np.int64)
        self.qhi = np.asarray(qhi, dtype=np.int64)

    def classify(self, lo, hi):
        if np.any(hi < self.qlo) or np.any(lo > self.qhi):
            return self.DISJOINT
        if np.all(lo >= self.qlo) and np.all(hi <= self.qhi):
            return self.CONTAINED
        return self.PARTIAL


class BallRegion(_Region):
    """Exact int arithmetic: squared distances (circle predicates,
    utility/box_op.hpp:91-134)."""

    def __init__(self, center, r2: int):
        self.c = np.asarray(center, dtype=np.int64)
        self.r2 = int(r2)

    def classify(self, lo, hi):
        nearest = np.clip(self.c, lo, hi)
        dmin2 = int(np.sum((nearest - self.c) ** 2))
        if dmin2 > self.r2:
            return self.DISJOINT
        farthest = np.where(np.abs(lo - self.c) > np.abs(hi - self.c), lo, hi)
        dmax2 = int(np.sum((farthest - self.c) ** 2))
        if dmax2 <= self.r2:
            return self.CONTAINED
        return self.PARTIAL


class ConvexPolygonRegion(_Region):
    """CCW convex polygon, d=2 only. Separating-axis classification."""

    def __init__(self, verts: np.ndarray):
        self.v = np.asarray(verts, dtype=np.int64)  # (m, 2)
        self.e = np.roll(self.v, -1, axis=0) - self.v  # edges

    def _corners(self, lo, hi):
        return np.array([[lo[0], lo[1]], [lo[0], hi[1]], [hi[0], lo[1]], [hi[0], hi[1]]], dtype=np.int64)

    def classify(self, lo, hi):
        corners = self._corners(lo, hi)
        # cross((v1-v0),(p-v0)) per edge x corner
        rel = corners[None, :, :] - self.v[:, None, :]
        cross = self.e[:, None, 0] * rel[:, :, 1] - self.e[:, None, 1] * rel[:, :, 0]
        if np.all(cross >= 0):
            return self.CONTAINED
        if np.any(np.all(cross < 0, axis=1)):  # box fully outside one edge
            return self.DISJOINT
        # polygon-box SAT on box axes
        if np.all(self.v[:, 0] < lo[0]) or np.all(self.v[:, 0] > hi[0]):
            return self.DISJOINT
        if np.all(self.v[:, 1] < lo[1]) or np.all(self.v[:, 1] > hi[1]):
            return self.DISJOINT
        return self.PARTIAL


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
    row filter. Quadtree descent with a budget: once the frontier would
    exceed ``budget`` cells, remaining PARTIAL cells are emitted as
    boundary at their current level (correct, just scans a few more rows).
    """
    d, L, gb = cfg.dims, cfg.index_level, cfg.grid_bits
    rows = []
    for qid, region in regions:
        frontier = [(0, 0)]
        out = []
        while frontier:
            nxt = []
            for level, cell in frontier:
                lo, hi = _cell_bounds(cell, level, d, gb)
                cls = region.classify(lo, hi)
                if cls == _Region.DISJOINT:
                    continue
                if cls == _Region.CONTAINED:
                    out.append((qid, level, cell, True))
                elif level >= L:
                    out.append((qid, level, cell, False))
                else:
                    nxt.append((level + 1, cell << d))
                    for i in range(1, 1 << d):
                        nxt.append((level + 1, (cell << d) | i))
            if len(out) + len(nxt) > budget:
                out.extend((qid, lv, cl, False) for lv, cl in nxt)
                nxt = []
            frontier = nxt
        rows.extend(out)
    return pd.DataFrame(rows, columns=["qid", "level", "cell", "interior"]).astype(
        {"qid": "int64", "level": "int32", "cell": "int64", "interior": "bool"}
    )
