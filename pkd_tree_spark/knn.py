"""Batch k-nearest-neighbor via expanding-ring candidate joins.

Reference operators reproduced (SURVEY.md §2.3): Q1 k_nearest DFS with
lower-bound pruning (query_op/nn_search.hpp:81-126), Q2 bounded top-k
(nn_search_helpers.h:18-93), Q4 batch harness (testFramework.h:470-520).

Distributed formulation: each query scans the cells within Chebyshev ring
r of its home cell at a per-query grid level g (cell width w =
2^(grid_bits-g)). After ring r, any unscanned point is at distance
>= r*w + 1, so a query terminates once kth_dist^2 <= (r*w)^2 — exactly the
`p2b_min_distance > bq.top()` prune of nn_search.hpp:121-123 lifted to
ring granularity. Rings double until the (clipped) grid is exhausted, so
termination is unconditional.

Skew adaptivity (the kd-tree's density-adaptive depth, which a fixed grid
lacks): a per-query level is chosen from a density ladder — point counts
rolled up from a fine-level histogram — so queries inside dense Varden
clusters use fine cells (small candidate sets) while queries in sparse
space start coarse (few ring rounds). The histogram is one aggregation of
the points table; at cluster scale it is broadcast instead of collected.

Physical plan per round: per-level broadcast equi-joins on the cell
prefix, unioned, then a TWO-LEVEL partial top-k — slice(array_sort, k)
per (qid, cell) first (map-side partial aggregation: a hot cell's
candidates never cross the shuffle), then a per-qid merge of the <=
cells*k survivors. This is the bounded queue of nn_search_helpers.h as an
algebraic aggregate; no global window, no full candidate shuffle.
All distances are exact int64 squared-L2.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import EngineConfig
from .index import SpatialIndex
from .zorder import morton_encode_np

__all__ = ["auto_knn_level", "knn", "knn_join"]


def auto_knn_level(n: int, d: int, target_per_cell: int = 128, grid_bits: int = 20) -> int:
    """Global fallback level: a cell holds ~target rows under uniformity."""
    if n <= target_per_cell:
        return 1
    level = int(math.floor(math.log2(max(2, n / target_per_cell)) / d))
    return max(1, min(grid_bits, level))


def _density_levels(
    index: SpatialIndex,
    queries: pd.DataFrame,
    k: int,
    level_floor: int,
    level_cap: int,
    target: int,
) -> np.ndarray:
    """Per-query grid level from a density ladder.

    ONE aggregation computes the counts of every query's home cell at every
    ladder level simultaneously (explode the point's (level, cell) pairs,
    broadcast-semi-join against the queries' home cells, groupBy): the
    collect is <= n_queries * ladder rows regardless of table size, and the
    job count is constant — no per-level barrier. The descent itself is
    then pure numpy. This recovers the kd-tree's density-adaptive depth
    with a single extra pass over the cached points.
    """
    d, kb, cb = index.cfg.dims, index.cfg.grid_bits, index.cfg.coord_bits
    spark = index.points.sparkSession
    q = np.stack([queries[f"q{j}"].to_numpy(dtype=np.int64) for j in range(d)], axis=1)
    # step-2 ladder: cell area jumps 4x (d=2) per rung, plenty of resolution
    # for a candidate-count target while halving the exploded histogram rows
    ladder = list(range(level_floor, level_cap + 1, 2))
    home = {lvl: morton_encode_np(q >> (cb - lvl), bits=lvl) for lvl in ladder}
    pairs = pd.concat(
        [pd.DataFrame({"lvl": np.int32(lvl), "c": np.unique(home[lvl])}) for lvl in ladder],
        ignore_index=True,
    )
    lvl_cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lvl).cast("int").alias("lvl"),
                    F.shiftrightunsigned("morton", d * (kb - lvl)).alias("c"),
                )
                for lvl in ladder
            ]
        )
    ).alias("s")
    # density only picks levels, so a sampled histogram is plenty: cap the
    # scanned rows at ~2M and scale counts back up (noise just moves a query
    # one rung, which the ring bound absorbs)
    src = index.points
    scale = 1.0
    n_est = int(index.meta.agg(F.sum("cnt")).collect()[0][0] or 0)  # tiny cached agg
    if n_est > 2_000_000:
        frac = 2_000_000 / n_est
        src = src.sample(fraction=frac, seed=42)
        scale = 1.0 / frac
    hist = (
        src.select(lvl_cells)
        .select(F.col("s.lvl").alias("lvl"), F.col("s.c").alias("c"))
        .join(F.broadcast(spark.createDataFrame(pairs)), ["lvl", "c"])
        .groupBy("lvl", "c")
        .count()
        .toPandas()
    )
    tab = {(int(lvl), int(c)): int(n * scale) for lvl, c, n in hist.itertuples(index=False, name=None)}

    levels = np.full(len(queries), level_floor, dtype=np.int64)
    thresh = max(target, 3 * k)
    active = np.ones(len(queries), dtype=bool)
    for i, lvl in enumerate(ladder[:-1]):
        cnts = np.array([tab.get((lvl, int(c)), 0) for c in home[lvl]], dtype=np.int64)
        # 3^d-neighborhood estimate: home-cell count * 3^d (upper-bounds the
        # block under local uniformity; conservative in cluster cores)
        deepen = active & (cnts * (3**d) > thresh)
        levels[deepen] = ladder[i + 1]
        active = deepen
        if not active.any():
            break
    return levels


def _candidate_cells(qpd: pd.DataFrame, d: int, coord_bits: int) -> pd.DataFrame:
    """(qid, level, cell) for all cells within each query's Chebyshev radius
    ``r`` at its grid ``level``. Vectorized per (level, r) group; clipped to
    the grid and deduplicated."""
    frames = []
    for (level, r), grp in qpd.groupby(["level", "r"]):
        level, r = int(level), int(r)
        w_shift = coord_bits - level
        gmax = (1 << level) - 1
        g = np.stack([grp[f"q{j}"].to_numpy(dtype=np.int64) >> w_shift for j in range(d)], axis=1)
        rng = np.arange(-r, r + 1)
        mesh = np.stack(np.meshgrid(*([rng] * d), indexing="ij"), axis=-1).reshape(-1, d)
        cells = np.clip(g[:, None, :] + mesh[None, :, :], 0, gmax)
        m, c, _ = cells.shape
        enc = morton_encode_np(cells.reshape(-1, d), bits=level).reshape(m, c)
        frames.append(
            pd.DataFrame(
                {
                    "qid": np.repeat(grp["qid"].to_numpy(), c),
                    "level": np.int32(level),
                    "cell": enc.reshape(-1),
                }
            ).drop_duplicates(ignore_index=True)
        )
    return pd.concat(frames, ignore_index=True)


def knn(
    index: SpatialIndex,
    queries: pd.DataFrame,
    k: int = 10,
    level: int | None = None,
    max_rounds: int = 64,
    adaptive: bool = True,
    target_candidates: int = 256,
) -> DataFrame:
    """Exact batch kNN. queries: pandas (qid, q0..q{d-1}) int64.

    Returns (qid, rn, key, doc_id, span_idx, dist2), rn in 1..k, ordered by
    (dist2, key, span_idx); duplicate points count as distinct neighbors
    (multiset semantics — dummy-leaf multiplicity, build_tree.hpp:183-186).
    """
    spark = index.points.sparkSession
    cfg: EngineConfig = index.cfg
    d, kb, cb = cfg.dims, cfg.grid_bits, cfg.coord_bits

    if level is None:
        level = cfg.knn_level
    level = min(level, kb)
    pend = queries.copy()
    if adaptive:
        cap = min(kb, level + 10)
        pend["level"] = _density_levels(index, pend, k, level, cap, target_candidates)
    else:
        pend["level"] = level
    pend["r"] = 1

    qcols = [f"q{j}" for j in range(d)]
    dist2 = None
    for j in range(d):
        t = (F.col(f"x{j}") - F.col(f"q{j}")) * (F.col(f"x{j}") - F.col(f"q{j}"))
        dist2 = t if dist2 is None else dist2 + t

    result_parts: list[DataFrame] = []

    for _ in range(max_rounds):
        if pend.empty:
            break
        cand_cells = _candidate_cells(pend, d, cb)
        qdf = F.broadcast(spark.createDataFrame(pend[["qid"] + qcols]))
        branches = []
        for lvl, grp in cand_cells.groupby("level"):
            cells_df = F.broadcast(spark.createDataFrame(grp[["qid", "cell"]]))
            p = index.points.withColumn("pcell", F.shiftrightunsigned("morton", d * (kb - int(lvl))))
            branches.append(p.join(cells_df, p.pcell == cells_df.cell))
        cand = branches[0]
        for b in branches[1:]:
            cand = cand.unionByName(b)
        cand = cand.join(qdf, "qid")

        entry = F.struct(
            dist2.cast("long").alias("dist2"),
            F.col("key"),
            F.col("span_idx").cast("long").alias("span_idx"),
            F.col("doc_id"),
        )
        lvl1 = cand.groupBy("qid", "pcell").agg(
            F.slice(F.array_sort(F.collect_list(entry)), 1, k).alias("tk"),
            F.count(F.lit(1)).alias("c"),
        )
        lvl2 = (
            lvl1.groupBy("qid")
            .agg(
                F.slice(F.array_sort(F.flatten(F.collect_list("tk"))), 1, k).alias("tk"),
                F.sum("c").alias("cnt"),
            )
            .persist()
        )
        stats = (
            lvl2.select("qid", "cnt", F.try_element_at(F.col("tk"), F.lit(k)).getField("dist2").alias("kth"))
            .toPandas()
            .set_index("qid")
        )

        w_arr = (1 << (cb - pend["level"].to_numpy())).astype(np.int64)
        r_arr = pend["r"].to_numpy()
        covered_all = (2 * r_arr + 1) >= 2 * (1 << pend["level"].to_numpy())
        st = stats.reindex(pend["qid"])
        cnt = st["cnt"].fillna(0).to_numpy()
        kth = st["kth"].to_numpy(dtype="float64")  # NaN when cnt < k
        ok = (cnt >= k) & (np.nan_to_num(kth, nan=np.inf) <= (r_arr * w_arr).astype("float64") ** 2)
        done_mask = ok | (covered_all & (cnt > 0))
        drop_mask = covered_all & (cnt == 0)  # empty table for this query
        done = pend.loc[done_mask, "qid"].tolist()
        if done:
            done_df = F.broadcast(spark.createDataFrame(pd.DataFrame({"qid": done})))
            result_parts.append(lvl2.join(done_df, "qid", "left_semi"))
        pend = pend[~(done_mask | drop_mask)].copy()
        pend["r"] = pend["r"] * 2

    if not result_parts:
        return spark.createDataFrame(
            [], schema="qid long, rn long, key long, doc_id string, span_idx long, dist2 long"
        )
    allres = result_parts[0]
    for p in result_parts[1:]:
        allres = allres.unionByName(p)
    return allres.select("qid", F.posexplode("tk").alias("pos", "s")).select(
        "qid",
        (F.col("pos") + 1).cast("long").alias("rn"),
        F.col("s.key").alias("key"),
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.span_idx").cast("long").alias("span_idx"),
        F.col("s.dist2").alias("dist2"),
    )


def knn_join(index: SpatialIndex, k: int = 10, sample_mod: int = 100, sample_val: int = 3) -> DataFrame:
    """kNN-graph builder (S5 analog, testFramework.h:742-815): kNN of a
    deterministic 1%-style sample of the points against the index; output
    edges (src=qid, rn, dst=key, dist2) writeable as a weighted adjacency
    list via edges.write.parquet(...)."""
    qpd = (
        index.points.where(F.col("key") % sample_mod == sample_val)
        .select(F.col("key").alias("qid"), *[F.col(f"x{j}").alias(f"q{j}") for j in range(index.cfg.dims)])
        .toPandas()
        .drop_duplicates("qid", ignore_index=True)
    )
    return knn(index, qpd, k=k)
