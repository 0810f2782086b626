"""Raster <-> vector conversions over the cell grid (north-rule operator
set: "H3/S2 index, point-in-polygon, kNN, raster<->vector").

A "raster" here is the level-L grid aggregate of the point table —
(g0..g{d-1}, val) per non-empty cell; "vector" features are boxes/convex
polygons in coordinate space. All conversions are exact integer arithmetic
and SQL-expressible for the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import EngineConfig
from .index import SpatialIndex

__all__ = ["rasterize", "raster_to_vector", "vector_to_raster", "tile_assignments"]


def rasterize(index: SpatialIndex, level: int, value: str = "cnt") -> DataFrame:
    """Points -> raster: per-cell aggregate at ``level``. value='cnt' gives
    counts (the histogram raster); any x-column name gives its per-cell sum.
    Output (g0..g{d-1}, val). One aggregation, map-side partial."""
    d = index.cfg.dims
    shift = index.cfg.coord_bits - level
    gcols = [F.shiftrightunsigned(f"x{j}", shift).alias(f"g{j}") for j in range(d)]
    gb = index.points.select(*gcols, *([] if value == "cnt" else [value])).groupBy(
        *[f"g{j}" for j in range(d)]
    )
    agg = F.count(F.lit(1)) if value == "cnt" else F.sum(value)
    return gb.agg(agg.cast("long").alias("val"))


def raster_to_vector(raster: DataFrame, level: int, threshold: int, cfg: EngineConfig) -> DataFrame:
    """Raster -> vector: cells with val >= threshold become axis-aligned box
    features in coordinate space: (g0.., lo0.., hi0.., val). The box is the
    cell's geometric extent — the building block for contour/region
    polygonization (adjacent boxes can then be unioned downstream)."""
    d = cfg.dims
    w = cfg.width_at(level)
    cols = (
        [F.col(f"g{j}") for j in range(d)]
        + [(F.col(f"g{j}") * w).cast("long").alias(f"lo{j}") for j in range(d)]
        + [(F.col(f"g{j}") * w + (w - 1)).cast("long").alias(f"hi{j}") for j in range(d)]
        + [F.col("val")]
    )
    return raster.where(F.col("val") >= threshold).select(*cols)


def vector_to_raster(
    spark: SparkSession, polys: pd.DataFrame, level: int, cfg: EngineConfig
) -> DataFrame:
    """Vector -> raster (burn): for each convex polygon (qid, vx, vy — CCW
    int vertices), emit the level-``level`` cells whose CENTER (doubled
    coordinates, exact ints) lies inside. Output (qid, g0, g1).

    Plan: candidate cells come from EACH POLYGON'S BBOX grid span —
    F.sequence over [floor(min_x/w), floor(max_x/w)] per axis, exploded —
    then the half-plane predicate on doubled centers (2*center =
    2*g*w + w - 1 avoids fractional centers). Work is O(sum of bbox cells),
    independent of the grid resolution: round 2 cross-joined the FULL
    2^level x 2^level grid against every polygon, which scans 10^7-10^12
    rows per burn at realistic raster levels regardless of polygon size."""
    assert cfg.dims == 2
    w = cfg.width_at(level)
    n = 1 << level
    qdf = spark.createDataFrame(polys[["qid", "vx", "vy"]]).repartition(
        min(cfg.partitions, max(1, len(polys)))
    )
    # clamp the bbox span to the grid, then DROP polygons whose bbox misses
    # the grid entirely (max < 0 or min > n-1): F.sequence(start, stop) with
    # start > stop generates a DESCENDING sequence, which would burn
    # out-of-range cells for off-grid polygons instead of nothing
    cand = (
        qdf.withColumn("b0lo", F.greatest(F.lit(0), (F.array_min("vx") / w).cast("long")))
        .withColumn("b0hi", F.least(F.lit(n - 1), (F.array_max("vx") / w).cast("long")))
        .withColumn("b1lo", F.greatest(F.lit(0), (F.array_min("vy") / w).cast("long")))
        .withColumn("b1hi", F.least(F.lit(n - 1), (F.array_max("vy") / w).cast("long")))
        .where((F.col("b0lo") <= F.col("b0hi")) & (F.col("b1lo") <= F.col("b1hi")))
        .withColumn("g0", F.explode(F.sequence("b0lo", "b0hi")))
        .withColumn("g1", F.explode(F.sequence("b1lo", "b1hi")))
    )
    cx2 = (F.col("g0") * w) * 2 + (w - 1)  # doubled center coords (exact int)
    cy2 = (F.col("g1") * w) * 2 + (w - 1)
    nv = F.size("vx")

    def edge_ok(i):
        j = (i + F.lit(1)) % nv
        ex = F.element_at("vx", j + 1) - F.element_at("vx", i + 1)
        ey = F.element_at("vy", j + 1) - F.element_at("vy", i + 1)
        px = cx2 - F.element_at("vx", i + 1) * 2
        py = cy2 - F.element_at("vy", i + 1) * 2
        return (ex * py - ey * px) >= 0

    inside = F.forall(F.sequence(F.lit(0), nv - 1), edge_ok)
    return cand.where(inside).select("qid", "g0", "g1")


def tile_assignments(index: SpatialIndex, level: int) -> DataFrame:
    """Per-row tile assignment (doc_id, span_idx, g0..g{d-1}) — the output
    the north rule checks row-for-row ("attaching tile assignments")."""
    d = index.cfg.dims
    shift = index.cfg.coord_bits - level
    return index.points.select(
        "doc_id",
        "span_idx",
        *[F.shiftrightunsigned(f"x{j}", shift).alias(f"g{j}") for j in range(d)],
    )
