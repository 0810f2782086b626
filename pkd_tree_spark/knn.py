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

The query set is a DataFrame END-TO-END (the reference's headline batch is
10^7 queries, testFramework.h:470-520 with batchQueryRatio=0.01 at n=10^9 —
far beyond what a driver pandas round-trip survives):
  - ring-cell generation runs inside mapInPandas over the query table
    (vectorized numpy per Arrow batch; the cover machinery's shape);
  - per-round termination is a JOIN of the pending-query table against the
    aggregated per-query stats — column expressions decide done/continue,
    nothing per-query ever reaches the driver;
  - per round the engine issues O(1) driver actions (two localCheckpoints
    + one count), independent of query count;
  - candidate-cell tables are broadcast only while small (cell count
    threshold); past it the equi-join shuffles — AQE picks the strategy.
Each round's heavy intermediates are persisted for the round and
unpersisted before the next (no cache leak across rounds).

Skew adaptivity (the kd-tree's density-adaptive depth, which a fixed grid
lacks): a per-query level is chosen from a density ladder — point counts
rolled up from a (sampled) fine-level histogram — so queries inside dense
Varden clusters use fine cells (small candidate sets) while queries in
sparse space start coarse (few ring rounds). The histogram is one
aggregation of the points table, consumed as a DataFrame by per-rung
left joins (never collected).

Physical plan per round: per-level equi-joins on the cell prefix,
unioned, then a TWO-LEVEL partial top-k — slice(array_sort, k) per
(qid, cell) first (map-side partial aggregation: a hot cell's candidates
never cross the shuffle), then a per-qid merge of the <= cells*k
survivors. This is the bounded queue of nn_search_helpers.h as an
algebraic aggregate; no global window, no full candidate shuffle.
All distances are exact int64 squared-L2.

V3 introspection (validation.hpp:72-124, visited counter nn_search.hpp:85):
with return_stats=True the result is accompanied by a per-query stats
DataFrame (qid, rounds, cand_rows) — ring rounds taken and candidate rows
scanned, the distributed analog of tree-depth / visited-node counts.
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

# broadcast the candidate-cell table only below this many (qid, cell) rows;
# above it the cell join shuffles (10^7-query batches must not be broadcast)
BROADCAST_CELL_ROWS = 4_000_000
HIST_SAMPLE_ROWS = 2_000_000

RESULT_SCHEMA = "qid long, rn long, key long, doc_id string, span_idx long, dist2 long"
STATS_SCHEMA = "qid long, rounds int, cand_rows long"


def auto_knn_level(n: int, d: int, target_per_cell: int = 128, grid_bits: int = 20) -> int:
    """Global fallback level: a cell holds ~target rows under uniformity."""
    if n <= target_per_cell:
        return 1
    level = int(math.floor(math.log2(max(2, n / target_per_cell)) / d))
    return max(1, min(grid_bits, level))


def _assign_levels(
    index: SpatialIndex,
    qdf: DataFrame,
    k: int,
    level_floor: int,
    level_cap: int,
    target: int,
) -> DataFrame:
    """Append a per-query grid ``level`` column from a density ladder.

    ONE aggregation computes a (lvl, cell, cnt) histogram of the points at
    every ladder level (over a <=HIST_SAMPLE_ROWS sample — density only
    picks levels, so sampling noise just moves a query one rung, which the
    ring bound absorbs). The descent — deepen while the home cell's
    3^d-neighborhood estimate exceeds the candidate target — is a cascade
    of per-rung left joins + one CASE expression: fully distributed, the
    histogram is never collected. This recovers the kd-tree's
    density-adaptive depth (divide_rotate's data-driven splits) with a
    single extra pass over the cached points.
    """
    d, kb, cb = index.cfg.dims, index.cfg.grid_bits, index.cfg.coord_bits
    # step-2 ladder: cell area jumps 4x (d=2) per rung, plenty of resolution
    # for a candidate-count target while halving the exploded histogram rows
    ladder = list(range(level_floor, level_cap + 1, 2))
    if len(ladder) == 1:
        return qdf.withColumn("level", F.lit(ladder[0]).cast("int"))

    # one tiny agg of the cached metadata decides whether the ladder is
    # worth paying for: when the hottest index cell is within ~4x of the
    # mean (no Varden-style density spread), every query gets the floor
    # level and the histogram pass is skipped — the kd-tree analog is a
    # balanced tree whose depth needs no per-leaf adaptation
    s = index.meta.agg(
        F.sum("cnt").alias("n"), F.max("cnt").alias("mx"), F.avg("cnt").alias("av")
    ).collect()[0]
    n_est = int(s["n"] or 0)
    if s["mx"] is not None and s["av"] and float(s["mx"]) <= 4.0 * float(s["av"]):
        # uniform-density shortcut: the single level at which the expected
        # 3^d-neighborhood holds ~thresh points (what the ladder would pick
        # for every query anyway, computed from the mean instead)
        thresh0 = max(target, 3 * k)
        per_cell = max(1.0, thresh0 / float(3**d))
        lvl0 = int(round(math.log2(max(2.0, n_est / per_cell)) / d))
        lvl0 = max(ladder[0], min(ladder[-1], lvl0))
        return qdf.withColumn("level", F.lit(lvl0).cast("int"))

    src = index.points
    scale = 1.0
    if n_est > HIST_SAMPLE_ROWS:
        frac = HIST_SAMPLE_ROWS / n_est
        src = src.sample(fraction=frac, seed=42)
        scale = 1.0 / frac
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
    # one materialization: the rung lookups below must not re-run the
    # sample + explode + groupBy lineage per rung
    hist = (
        src.select(lvl_cells)
        .select(F.col("s.lvl").alias("lvl"), F.col("s.c").alias("c"))
        .groupBy("lvl", "c")
        .agg((F.count(F.lit(1)) * F.lit(scale)).cast("long").alias("hcnt"))
        .localCheckpoint(eager=True)
    )

    thresh = max(target, 3 * k)
    neigh = 3**d  # 3^d-neighborhood upper bound under local uniformity
    # ONE join does every rung at once: explode the query's (rung, home
    # cell) pairs, left-join the histogram, then pick the first (minimum)
    # rung whose neighborhood estimate fits the target; the last rung is
    # the unconditional fallback. Two shuffles total, ladder-independent.
    homes = F.explode(
        F.array(
            *[
                F.struct(F.lit(lvl).cast("int").alias("lvl"), _home_cell_expr(d, cb, lvl).alias("c"))
                for lvl in ladder[:-1]
            ]
        )
    ).alias("s")
    qx = qdf.select("qid", homes).select("qid", F.col("s.lvl").alias("lvl"), F.col("s.c").alias("c"))
    pick = (
        qx.join(hist, ["lvl", "c"], "left")
        .groupBy("qid")
        .agg(
            F.min(
                F.when(F.coalesce(F.col("hcnt"), F.lit(0)) * neigh <= thresh, F.col("lvl"))
            ).alias("_lv")
        )
    )
    return qdf.join(pick, "qid", "left").select(
        *qdf.columns, F.coalesce(F.col("_lv"), F.lit(ladder[-1])).cast("int").alias("level")
    )


def _home_cell_expr(d: int, cb: int, lvl: int):
    """Morton home cell of a query at a grid level — pure JVM expression."""
    from .zorder import morton_col

    gcols = [F.shiftrightunsigned(F.col(f"q{j}"), cb - lvl) for j in range(d)]
    return morton_col(gcols, d, lvl)


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
    if not frames:
        return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                             "level": pd.Series(dtype="int32"),
                             "cell": pd.Series(dtype="int64")})
    return pd.concat(frames, ignore_index=True)


def knn(
    index: SpatialIndex,
    queries: pd.DataFrame | DataFrame,
    k: int = 10,
    level: int | None = None,
    max_rounds: int = 64,
    adaptive: bool = True,
    target_candidates: int = 256,
    return_stats: bool = False,
):
    """Exact batch kNN. queries: pandas OR Spark DataFrame (qid, q0..q{d-1})
    int64 — the DataFrame path is the scale path (queries never touch the
    driver).

    Returns (qid, rn, key, doc_id, span_idx, dist2), rn in 1..k, ordered by
    (dist2, key, span_idx); duplicate points count as distinct neighbors
    (multiset semantics — dummy-leaf multiplicity, build_tree.hpp:183-186).
    With return_stats=True returns (result, stats) where stats is a
    per-query (qid, rounds, cand_rows) DataFrame (V3 introspection).
    """
    spark = index.points.sparkSession
    cfg: EngineConfig = index.cfg
    d, kb, cb = cfg.dims, cfg.grid_bits, cfg.coord_bits
    qcols = [f"q{j}" for j in range(d)]

    if isinstance(queries, pd.DataFrame):
        if queries.empty:
            empty = spark.createDataFrame([], schema=RESULT_SCHEMA)
            return (empty, spark.createDataFrame([], schema=STATS_SCHEMA)) if return_stats else empty
        qdf = spark.createDataFrame(queries[["qid"] + qcols])
    else:
        qdf = queries.select("qid", *qcols)

    if level is None:
        level = cfg.knn_level
    level = min(level, kb)
    if adaptive:
        cap = min(kb, level + 10)
        qdf = _assign_levels(index, qdf, k, level, cap, target_candidates)
    else:
        qdf = qdf.withColumn("level", F.lit(level).cast("int"))

    pend = qdf.withColumn("r", F.lit(1).cast("long")).localCheckpoint(eager=True)
    n_pend = pend.count()

    dist2 = None
    for j in range(d):
        t = (F.col(f"x{j}") - F.col(f"q{j}")) * (F.col(f"x{j}") - F.col(f"q{j}"))
        dist2 = t if dist2 is None else dist2 + t
    entry = F.struct(
        dist2.cast("long").alias("dist2"),
        F.col("key"),
        F.col("span_idx").cast("long").alias("span_idx"),
        F.col("doc_id"),
    )

    def _gen_cells(batches):
        for pdf in batches:
            if len(pdf):
                yield _candidate_cells(pdf, d, cb)

    result_parts: list[DataFrame] = []
    stats_parts: list[DataFrame] = []

    for rnd in range(1, max_rounds + 1):
        if n_pend == 0:
            break
        # ring-cell generation INSIDE executors (data-independent per query);
        # persisted so the per-level branches share one materialization.
        # One tiny agg on the cached cells yields the exact per-level cell
        # counts: the level list for branch construction AND the broadcast
        # decision in a single O(levels)-row action.
        cells = pend.mapInPandas(_gen_cells, schema="qid long, level int, cell long").persist()
        lvl_counts = {r["level"]: r["n"] for r in cells.groupBy("level").agg(F.count(F.lit(1)).alias("n")).collect()}
        bcast = sum(lvl_counts.values()) <= BROADCAST_CELL_ROWS
        levels = sorted(lvl_counts)

        branches = []
        for lvl in levels:
            cl = cells.where(F.col("level") == lvl).select("qid", "cell")
            if bcast:
                cl = F.broadcast(cl)
            p = index.points.withColumn("pcell", F.shiftrightunsigned("morton", d * (kb - lvl)))
            branches.append(p.join(cl, p.pcell == cl.cell).drop("cell"))
        cand = branches[0]
        for b in branches[1:]:
            cand = cand.unionByName(b)
        qside = pend.select("qid", *qcols)
        if n_pend <= BROADCAST_CELL_ROWS:
            qside = F.broadcast(qside)
        cand = cand.join(qside, "qid")

        lvl1 = cand.groupBy("qid", "pcell").agg(
            F.slice(F.array_sort(F.collect_list(entry)), 1, k).alias("tk"),
            F.count(F.lit(1)).alias("c"),
        )
        lvl2 = lvl1.groupBy("qid").agg(
            F.slice(F.array_sort(F.flatten(F.collect_list("tk"))), 1, k).alias("tk"),
            F.sum("c").alias("cnt"),
        )
        st = lvl2.select(
            "qid", "tk", "cnt",
            F.try_element_at(F.col("tk"), F.lit(k)).getField("dist2").alias("kth"),
        )

        # termination as COLUMN expressions over pend ⋈ stats — the ring
        # lower bound (r*w)^2 vs kth distance (nn_search.hpp:121-123).
        # ONE eager checkpoint materializes the round (flags included);
        # round results and the next pending set derive from it lazily, so
        # the heavy candidate join runs exactly once per round and the
        # driver issues 3 actions/round total (cells are persisted lazily).
        cnt0 = F.coalesce(F.col("cnt"), F.lit(0))
        rw2_ok = F.col("kth").isNotNull() & (
            F.col("kth") <= F.expr(f"shiftleft(r, CAST({cb} - level AS INT)) * shiftleft(r, CAST({cb} - level AS INT))")
        )
        covered_all = F.expr("2 * r + 1") >= F.expr("shiftleft(CAST(2 AS BIGINT), level)")
        done = ((cnt0 >= k) & rw2_ok) | (covered_all & (cnt0 > 0))
        drop = covered_all & (cnt0 == 0)
        j = (
            pend.join(st, "qid", "left")
            .withColumn("_done", done)
            .withColumn("_drop", drop)
            .withColumn("cand_rows", cnt0)
            .localCheckpoint(eager=True)
        )

        res_round = j.where("_done").select(
            "qid", "tk", F.lit(rnd).cast("int").alias("rounds"), "cand_rows"
        )
        result_parts.append(res_round)
        if return_stats:
            stats_parts.append(res_round.select("qid", "rounds", "cand_rows"))

        pend = j.where("NOT _done AND NOT _drop").select(
            "qid", *qcols, "level", (F.col("r") * 2).alias("r")
        )
        n_pend = pend.count()  # cheap: scans the checkpointed round frame
        cells.unpersist()

    if not result_parts:
        empty = spark.createDataFrame([], schema=RESULT_SCHEMA)
        return (empty, spark.createDataFrame([], schema=STATS_SCHEMA)) if return_stats else empty
    allres = result_parts[0]
    for p in result_parts[1:]:
        allres = allres.unionByName(p)
    out = allres.select("qid", F.posexplode("tk").alias("pos", "s")).select(
        "qid",
        (F.col("pos") + 1).cast("long").alias("rn"),
        F.col("s.key").alias("key"),
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.span_idx").cast("long").alias("span_idx"),
        F.col("s.dist2").alias("dist2"),
    )
    if return_stats:
        stats = stats_parts[0]
        for p in stats_parts[1:]:
            stats = stats.unionByName(p)
        return out, stats
    return out


def knn_join(index: SpatialIndex, k: int = 10, sample_mod: int = 100, sample_val: int = 3) -> DataFrame:
    """kNN-graph builder (S5 analog, testFramework.h:742-815): kNN of a
    deterministic 1%-style sample of the points against the index; output
    edges (src=qid, rn, dst=key, dist2) writeable as a weighted adjacency
    list via edges.write.parquet(...). The query sample stays a DataFrame —
    no driver round-trip, so the 1% ratio holds at any n."""
    qdf = (
        index.points.where(F.col("key") % sample_mod == sample_val)
        .select(F.col("key").alias("qid"), *[F.col(f"x{j}").alias(f"q{j}") for j in range(index.cfg.dims)])
        .dropDuplicates(["qid"])
    )
    return knn(index, qdf, k=k)
