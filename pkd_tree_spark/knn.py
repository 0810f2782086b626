"""Batch k-nearest-neighbor via expanding-ring candidate joins.

Reference operators reproduced (SURVEY.md §2.3): Q1 k_nearest DFS with
lower-bound pruning (query_op/nn_search.hpp:81-126), Q2 bounded top-k
(nn_search_helpers.h:18-93), Q4 batch harness (testFramework.h:470-520).

Distributed formulation: at grid level g (cell width w = 2^(grid_bits-g)),
after scanning every cell within Chebyshev ring r of a query's home cell,
any unscanned point is at Euclidean distance >= r*w + 1 from the query.
A query terminates when it has >= k candidates with kth_dist^2 <= (r*w)^2 —
exactly the `p2b_min_distance > bq.top()` prune of nn_search.hpp:121-123,
lifted from per-node to per-ring granularity. Rings double until the grid
is exhausted (clipping makes the candidate set = all non-empty cells, so
termination is unconditional — the full-scan fallback is implicit).

Each round is one broadcast equi-join (points.cell == candidate cell) +
one window top-k; the driver loop runs O(log grid) rounds, typically 1-3.
All distances are exact int64 squared-L2 (coords < 2^20 -> dist^2 < 2^43).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .config import EngineConfig
from .index import SpatialIndex
from .zorder import morton_encode_np

__all__ = ["auto_knn_level", "knn"]


def auto_knn_level(n: int, d: int, target_per_cell: int = 128, grid_bits: int = 20) -> int:
    """Pick the candidate-generation grid level so a cell holds ~target rows."""
    if n <= target_per_cell:
        return 1
    level = int(math.floor(math.log2(max(2, n / target_per_cell)) / d))
    return max(1, min(grid_bits, level))


def _candidate_cells(qpd: pd.DataFrame, rs: pd.Series, level: int, d: int, grid_bits: int) -> pd.DataFrame:
    """(qid, cell) pairs for all cells within per-query Chebyshev radius r.

    Vectorized numpy; clipped to the grid and deduplicated (clipping at the
    border collapses out-of-range neighbors onto edge cells).
    """
    w_shift = grid_bits - level
    gmax = (1 << level) - 1
    out_q, out_cells = [], []
    for r, grp in qpd.groupby(rs):
        r = int(r)
        g = np.stack([grp[f"q{j}"].to_numpy() >> w_shift for j in range(d)], axis=1)  # (m, d)
        rng = np.arange(-r, r + 1)
        mesh = np.stack(np.meshgrid(*([rng] * d), indexing="ij"), axis=-1).reshape(-1, d)  # ((2r+1)^d, d)
        cells = np.clip(g[:, None, :] + mesh[None, :, :], 0, gmax)  # (m, (2r+1)^d, d)
        m, c, _ = cells.shape
        enc = morton_encode_np(cells.reshape(-1, d), bits=level).reshape(m, c)
        out_q.append(np.repeat(grp["qid"].to_numpy(), c))
        out_cells.append(enc.reshape(-1))
    pdf = pd.DataFrame({"qid": np.concatenate(out_q), "cell": np.concatenate(out_cells)})
    return pdf.drop_duplicates(ignore_index=True)


def knn(
    index: SpatialIndex,
    queries: pd.DataFrame,
    k: int = 10,
    level: int | None = None,
    max_rounds: int = 32,
) -> DataFrame:
    """Exact batch kNN. queries: pandas (qid, q0..q{d-1}) int64.

    Returns (qid, rn, key, doc_id, span_idx, dist2) with rn in 1..k, ordered
    deterministically by (dist2, key, span_idx) — duplicate points count as
    distinct neighbors (multiset semantics, the dummy-leaf multiplicity of
    build_tree.hpp:183-186).
    """
    spark = index.points.sparkSession
    cfg: EngineConfig = index.cfg
    d, gb = cfg.dims, cfg.grid_bits
    if level is None:
        level = cfg.knn_level
    w = 1 << (gb - level)
    grid_span = 1 << level  # r >= grid_span covers everything after clipping

    qdf_all = spark.createDataFrame(queries).persist()
    qcols = [f"q{j}" for j in range(d)]

    dist2 = None
    for j in range(d):
        t = (F.col(f"x{j}") - F.col(f"q{j}")) * (F.col(f"x{j}") - F.col(f"q{j}"))
        dist2 = t if dist2 is None else dist2 + t

    pts = index.points.withColumn("pcell", F.shiftrightunsigned("morton", d * (gb - level)))

    r_by_qid = pd.Series(1, index=queries["qid"].to_numpy())  # current ring per query
    pending = queries.copy()
    final_r: dict[int, int] = {}

    for _ in range(max_rounds):
        if pending.empty:
            break
        rs = pending["qid"].map(r_by_qid)
        cand_cells = _candidate_cells(pending, rs, level, d, gb)
        cells_df = F.broadcast(spark.createDataFrame(cand_cells))
        qdf = F.broadcast(spark.createDataFrame(pending[["qid"] + qcols]))
        cand = pts.join(cells_df, pts.pcell == cells_df.cell).join(qdf, "qid")
        stats = (
            cand.select("qid", dist2.alias("d2"))
            .groupBy("qid")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.try_element_at(F.array_sort(F.collect_list("d2")), F.lit(k)).alias("kth"),
            )
            .toPandas()
            .set_index("qid")
        )
        done = []
        for qid in pending["qid"]:
            r = int(r_by_qid[qid])
            row = stats.loc[qid] if qid in stats.index else None
            covered_all = (2 * r + 1) >= 2 * grid_span
            if row is not None and row["cnt"] >= k and (row["kth"] <= (r * w) ** 2 or covered_all):
                final_r[qid] = r
                done.append(qid)
            elif covered_all and (row is None or row["cnt"] < k):
                # fewer than k points in the whole table
                final_r[qid] = r
                done.append(qid)
            else:
                r_by_qid[qid] = r * 2
        pending = pending[~pending["qid"].isin(done)]

    # final single plan over all queries at their terminal ring
    qall = queries.copy()
    rs = qall["qid"].map(pd.Series(final_r))
    cand_cells = _candidate_cells(qall, rs, level, d, gb)
    cells_df = F.broadcast(spark.createDataFrame(cand_cells))
    cand = pts.join(cells_df, pts.pcell == cells_df.cell).join(F.broadcast(qdf_all), "qid")
    win = Window.partitionBy("qid").orderBy("dist2", "key", "span_idx")
    return (
        cand.select("qid", "doc_id", "span_idx", "key", dist2.alias("dist2"))
        .withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= k)
        .select("qid", F.col("rn").cast("long").alias("rn"), "key", "doc_id",
                F.col("span_idx").cast("long").alias("span_idx"), F.col("dist2").cast("long").alias("dist2"))
    )
