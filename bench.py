"""Benchmark suite mirroring the reference's SIGMOD'25 workloads
(BASELINE.md): bulk build, batch 10-NN (1% of n queries), range count
(mixed-selectivity boxes), and 1% batch insert/delete — on both uniform
and varden-skew points, at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "suite_total", "value": <sum sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "n_points": n, "cpus": c,
   "throughput": {name: items/sec, ...}}

--scaling: run the suite in two subprocesses (local[N], local[4N]) on the
same input and report throughput scaling efficiency (the sandbox stand-in
for the north rule's N vs 4N executors; methodology mirrors
script/scalability.sh). Writes BENCH/SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Point dimensionality. d=2 is the suite default; SPARK_GRAFT_DIMS=3 runs the
# reference's headline dimension (script/data/build.csv, knn.csv are d=3) —
# build/collapse/kNN/range-count only, so the d3 scaling row stays cheap.
DIMS = int(os.environ.get("SPARK_GRAFT_DIMS", "2"))
# Deterministic input replication: key' = key + replica*1e8 keeps coordinate
# derivation intact while multiplying n. The per-round bench uses 1; the
# --scaling study uses 16 (~10M points) so each core has real work — a
# scaling test at 600k rows measures scheduler overhead, not the engine.
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "1"))


def _physical_cores() -> int:
    try:
        out = subprocess.run(["lscpu", "-p=Core,Socket"], capture_output=True, text=True).stdout
        cores = {l for l in out.splitlines() if l and not l.startswith("#")}
        if cores:
            return len(cores)
    except Exception:  # noqa: BLE001
        pass
    return max(1, (os.cpu_count() or 2) // 2)


def run_suite() -> dict:
    from pyspark.sql import functions as F

    from pkd_tree_spark import fixtures as FX
    from pkd_tree_spark.config import EngineConfig
    from pkd_tree_spark.documents import load_points
    from pkd_tree_spark.index import SpatialIndex
    from pkd_tree_spark.knn import auto_knn_level, knn
    from pkd_tree_spark.ranges import range_count_boxes, range_cover_stats
    from pkd_tree_spark.session import get_spark
    from pkd_tree_spark.updates import merge_delete, merge_insert

    spark = get_spark(app="pkd-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    thr: dict[str, float] = {}
    knn_stats: dict[str, dict] = {}
    range_stats: dict[str, dict] = {}

    def timed(name: str, fn, items: int | None = None):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        if items:
            thr[name] = round(items / dt, 1)
        return out

    # warm the JVM/session so build timings don't pay first-job setup
    spark.range(1000).count()

    keys_df = None
    if REPLICATE > 1:
        from pkd_tree_spark.documents import doc_key_col

        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        # stream the many-split range side, broadcast the small key list, so
        # replica generation is parallel (the parquet is a single split)
        # replica key stride: 2e7 up to 64 replicas (clear of the gate's
        # insert-batch range 1e7..1.6e7 — irrelevant here, kept for r1/r2
        # comparability); 1e7 beyond, so k*A1 stays < 2^63 at replicate=256
        # (153.6M pts): 2e7*256*2.65e9 would overflow int64 and wrap
        # coordinates negative. sf0.1 base keys are < 6.1e6, so replicas
        # never collide at either stride. The insert-batch key offsets below
        # (3e9/3.2e9) sit past the largest replica key (255*1e7 + 6.1e6 ≈
        # 2.56e9), so inserted keys never collide with replica keys at ANY
        # replicate (the old 5e7/6e7 offsets were multiples of the 1e7
        # stride: inserts collided with the rep+5/rep+6 replicas, creating
        # duplicate keys and making delete-by-key remove ~2x the batch).
        # Inserted keys never pass coordinate derivation (the batch keeps
        # its x-columns), so k*A1 overflow does not apply to them.
        stride = 20_000_000 if REPLICATE <= 64 else 10_000_000
        keys_df = (
            spark.range(0, REPLICATE, 1, CPUS)
            .select(F.col("id").alias("rep"))
            .crossJoin(F.broadcast(li.select(doc_key_col().alias("k"))))
            .select((F.col("k") + F.col("rep") * F.lit(stride)).alias("k"))
        )

    # RESIDENCY BOUND (r4 153.6M lesson: by the update section ~6 persisted
    # full-size tables were alive and 16-core runs GC-thrashed into negative
    # scaling): the suite runs one distribution at a time and releases every
    # cached table the moment its section ends — SpatialIndex.release is
    # BLOCKING, so the drop completes before the next timed section (an
    # explicit System.gc() here measurably anti-scaled the following
    # 16-core update sections and is deliberately absent).
    import gc as _gc

    def _gc_release(*indexes):
        for ix_ in indexes:
            if ix_ is not None:
                ix_.release()
        _gc.collect()

    n_points = 0
    cfg_uniform = None
    xcols = [f"x{j}" for j in range(DIMS)]
    # index_level per d: deepest level whose worst-case cell count stays
    # inside the driver-memoizable skeleton (2^(d*L) <= META_MEMO_CELLS)
    idx_level = {2: 7, 3: 6}.get(DIMS, max(1, 18 // DIMS))
    for dist in ("uniform", "varden"):
        pts = load_points(spark, SF_DIR, dims=DIMS, dist=dist, keys_df=keys_df)
        # Partition count is DATA-sized (~1.2M rows per range bucket) and
        # identical at every core count: the scaling study must vary only
        # parallelism, not the physical plan (mirrors scalability.sh keeping
        # the algorithm fixed across thread counts). Spill-aware: a bucket
        # stays ~100MB regardless of executor count.
        n_target = REPLICATE * 600_000
        parts = max(32, n_target // 1_200_000)
        cfg = EngineConfig(dims=DIMS, index_level=idx_level, knn_level=idx_level - 1, partitions=parts)

        def _build(pts=pts, cfg=cfg):
            ix = SpatialIndex.build(pts, cfg)
            ix.points.count()  # force the shuffle + persist
            ix.meta.count()
            # the staged input served its purpose (sampling + shuffle);
            # the persisted index is materialized, so drop the stage now
            # instead of carrying a second full-size table through the
            # query sections
            ix.release_staged()
            return ix

        ix = timed(f"build_{dist}", _build)
        n_points = ix.points.count()
        if dist == "uniform":
            cfg_uniform = cfg
        thr[f"build_{dist}"] = round(n_points / times[f"build_{dist}"], 1)

        # dummy-leaf duplicate collapse (build_tree.hpp:183-186): index
        # state the reference constructs DURING build — timed as its own
        # entry so neither build nor kNN absorbs the one-time pass. The
        # suite's k is 10; the pruned cap (>=16) serves any k <= 16.
        def _collapse(ix=ix):
            p = ix.pruned_points(10)
            return p.count() if p is not None else 0

        timed(f"dedup_collapse_{dist}", _collapse, items=n_points)

        # batch 10-NN: in-distribution query sample of the input itself at
        # the reference's TRUE 1% ratio (batchQueryRatio=0.01,
        # testFramework.h:24) — the query set stays a DataFrame end-to-end,
        # so there is no driver-side cap on query count
        qdf = (
            ix.points.where(F.col("key") % 100 == 3)
            .select(F.col("key").alias("qid"), *[F.col(f"x{j}").alias(f"q{j}") for j in range(DIMS)])
            .dropDuplicates(["qid"])
            .persist()
        )
        nq = qdf.count()
        lvl = auto_knn_level(n_points, DIMS)

        def _knn_run(ix=ix, qdf=qdf, lvl=lvl):
            res, stats = knn(ix, qdf, k=10, level=lvl, return_stats=True)
            res.groupBy().agg(F.sum("dist2")).collect()
            # V3 introspection (validation.hpp:72-124 analog): ring rounds +
            # candidate rows scanned per query, aggregated
            s = stats.agg(
                F.avg("rounds").alias("avg_rounds"),
                F.max("rounds").alias("max_rounds"),
                F.avg("cand_rows").alias("avg_cand_rows"),
            ).collect()[0]
            knn_stats[dist] = {
                "avg_ring_rounds": round(float(s["avg_rounds"]), 3),
                "max_ring_rounds": int(s["max_rounds"]),
                "avg_candidate_rows": round(float(s["avg_cand_rows"]), 1),
                # dummy-leaf duplicate collapse: rows in the pruned
                # candidate table when it engaged (None = dup factor too
                # low, raw path). cand_rows above already reflect it.
                "pruned_rows": (
                    ix._pruned[0].count() if isinstance(ix._pruned, tuple) else None
                ),
            }

        timed(f"knn10_{dist}", _knn_run, items=nq)
        qdf.unpersist()

        # range count: mixed-selectivity boxes (reference summary uses 10^4;
        # scaled-up input uses more boxes so parallel scan work dominates)
        boxes_n = int(os.environ.get("SPARK_GRAFT_RANGE_BOXES", "10000" if REPLICATE > 1 else "1000"))
        boxes = FX.box_fixtures(boxes_n, DIMS)
        timed(
            f"range_count_{dist}",
            lambda ix=ix, boxes=boxes: range_count_boxes(ix, boxes).groupBy().agg(F.sum("cnt")).collect(),
            items=len(boxes),
        )
        range_stats[dist] = range_cover_stats(ix, boxes)

        # selectivity brackets (reference query types 0/1/2,
        # testFramework.h:114-131 — the '10^4 large boxes' row is type 2).
        # d!=2 runs keep to the headline ops (build/collapse/kNN/range).
        if dist == "uniform" and DIMS == 2:
            for btype in (0, 1, 2):
                bb = FX.box_fixtures_bracketed(boxes_n, 2, n_points, btype)
                timed(
                    f"range_count_type{btype}",
                    lambda ix=ix, bb=bb: range_count_boxes(ix, bb).groupBy().agg(F.sum("cnt")).collect(),
                    items=len(bb),
                )

            # batch update: insert then delete a 1% batch
            # (tests/test.cpp:53-74) — run while the uniform index is the
            # ONLY resident index, and release each derived index as soon
            # as its measurement lands
            batch = (
                ix.points.where(F.col("key") % 100 == 7)
                .select("doc_id", "span_idx", (F.col("key") + 3_000_000_000).alias("key"), *xcols)
            ).persist()
            bn = batch.count()
            # materialization (count) happens INSIDE timed(): merge_insert
            # only builds a lazy plan, so timing it alone measures nothing
            def _do_insert():
                ins = merge_insert(ix, batch)
                ins.points.count()
                ins.meta.count()  # metadata refresh is part of the cost (M2)
                return ins

            ins = timed("batch_insert_1pct", _do_insert, items=bn)

            # delete measures the SAME contract as insert (points + meta
            # materialized — r5 left the meta delta lazy and undercounted).
            # exact_rows: the batch is the verbatim row multiset being
            # removed (it was just inserted), the reference's batchDelete
            # point-batch contract — meta delta aggregates the batch, and
            # the broadcast anti-join streams the table with no shuffle.
            def _do_delete(ins=ins):
                dels = merge_delete(ins, batch, exact_rows=True)
                dels.points.count()
                dels.meta.count()
                return dels

            dels = timed("batch_delete_1pct", _do_delete, items=bn)
            batch.unpersist()
            _gc_release(dels, ins)

            # 10% batch sweep (reference sweeps 0.01%..10%,
            # summary_3inba.csv): the large-batch path must not broadcast
            # the delete-key set
            batch10 = (
                ix.points.where(F.col("key") % 10 == 7)
                .select("doc_id", "span_idx", (F.col("key") + 3_200_000_000).alias("key"), *xcols)
            ).persist()
            bn10 = batch10.count()

            def _do_insert10():
                ins10 = merge_insert(ix, batch10)
                ins10.points.count()
                ins10.meta.count()
                return ins10

            ins10 = timed("batch_insert_10pct", _do_insert10, items=bn10)

            # 10% of 153.6M = 15.4M keys: past DELETE_BCAST_ROWS, so this
            # exercises the shuffled-hash fallback (no 10^8-row sorts)
            def _do_delete10(ins10=ins10):
                dels10 = merge_delete(ins10, batch10, exact_rows=True)
                dels10.points.count()
                dels10.meta.count()
                return dels10

            dels10 = timed("batch_delete_10pct", _do_delete10, items=bn10)
            batch10.unpersist()
            _gc_release(dels10, ins10)

        # end of this distribution's section: nothing downstream reads this
        # index — drop every cached table before the next build
        _gc_release(ix)
        del ix

    # incremental-build step-ratio sweep (the reference sweeps {10,20,25,50}%
    # insertion steps, testFramework.h:209-254); per-ratio total build time.
    # Skipped in --scaling runs (REPLICATE>1): the scaling table tracks the
    # headline query ops, and the sweep would triple each level's wall time.
    base_ids: list = []
    base_pts = None
    if DIMS == 2:
        base_pts = load_points(spark, SF_DIR, dims=2, dist="uniform", keys_df=keys_df)
        if REPLICATE == 1:
            # stage the sweep's source once: every merge step filters base_pts,
            # and an unstaged derived pipeline re-runs the span synthesis per
            # step (1-2s x steps of pure derivation — the reference's
            # incremental source is an in-memory array, testFramework.h:209).
            # tracked: DataFrame.unpersist is a no-op on checkpoint-backed
            # frames, so the release below goes through the RDD ids.
            from pkd_tree_spark.index import release_rdd_ids, tracked_local_checkpoint

            base_pts, base_ids = tracked_local_checkpoint(base_pts)
    for ratio in () if (REPLICATE > 1 or DIMS != 2) else (10, 20, 25, 50):
        steps = 100 // ratio

        def _inc(steps=steps):
            from pkd_tree_spark.updates import checkpoint_index, merge_insert as _mi

            inc = SpatialIndex.build(base_pts.where(F.col("key") % steps == 0), cfg_uniform)
            for s in range(1, steps):
                prev = inc
                merged = _mi(inc, base_pts.where(F.col("key") % steps == s), persist=False)
                # truncate lineage per step (as U7/U8 do) with TRACKED
                # checkpoint ids, then drop the superseded generation NOW:
                # rebinding alone leaves each step's 600k-row checkpoint
                # blocks to the async ContextCleaner (across the 4-ratio
                # sweep that stacked ~20 resident tables and spiked later
                # in-suite timings 3x), and r5's prev.release() was itself
                # a silent no-op for generations >= 2 — checkpoint-backed
                # frames never register with the CacheManager.
                inc = checkpoint_index(merged)
                prev.release()
            n = inc.points.count()
            inc.release()
            return n

        timed(f"incremental_build_r{ratio}", _inc, items=n_points)

    if base_ids:
        from pkd_tree_spark.index import release_rdd_ids

        release_rdd_ids(spark, base_ids)

    # ann_lsh recall vs the exact MIPS baseline (approximate operator: the
    # gate checks rows only, so a recall regression must surface HERE)
    ann_recall = None
    if DIMS == 2 and os.path.exists(f"{SF_DIR}/embeddings.parquet"):
        # a real ann_lsh/topk_dot failure must propagate — a bare except here
        # once reported recall=null instead of surfacing regressions; only
        # the missing-table case (checked above) is a legitimate skip
        from pkd_tree_spark.pipeline.similarity import ann_lsh, topk_dot

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        exact = {(r["qid"], r["vec_id"]) for r in topk_dot(emb).collect()}

        def _ann():
            return {(r["qid"], r["vec_id"]) for r in ann_lsh(emb).collect()}

        approx = timed("ann_lsh", _ann)
        ann_recall = round(len(exact & approx) / max(1, len(exact)), 4)

    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    return {
        "metric": "suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "n_points": int(n_points),
        "cpus": CPUS,
        "replicate": REPLICATE,
        "dims": DIMS,
        "throughput": thr,
        "knn_stats": knn_stats,
        "range_stats": range_stats,
        "ann_recall_at_10": ann_recall,
    }


def run_scaling(base: int | None = None, mult: int = 4) -> dict:
    """Same job at local[base] and local[base*mult]; efficiency =
    (T_base / T_big) / mult per headline query (>=0.8 target).

    base defaults to physical_cores/4 so that base*4 stays within PHYSICAL
    cores: this sandbox advertises 32 logical CPUs but has 16 physical
    (SMT) — a 32-thread run oversubscribes and measures hyperthread
    contention, not the engine's scaling (mirrors the reference pinning
    real cores via numactl, script/scalability.sh)."""
    if base is None:
        # lscpu in this VM reports every vCPU as its own core, but a fixed-
        # work burner test shows ~16 truly-parallel cores (32 burners take
        # 1.33x the wall of 16). Default to 4-vs-16 so both levels sit
        # within real cores; override with SPARK_GRAFT_SCALE_BASE.
        base = int(os.environ.get("SPARK_GRAFT_SCALE_BASE", "4"))
    results = {}
    rep = os.environ.get("SPARK_GRAFT_REPLICATE", "16")
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))
    for c in (base, base * mult):
        env = dict(
            os.environ, SPARK_GRAFT_CPUS=str(c), SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_REPLICATE=rep
        )
        best = None
        for _ in range(repeats):  # min-of-N: the sandbox VM has 2-3x timing noise
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True, check=True
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if best is None:
                best = r
            else:
                for qn, t in r["queries"].items():
                    if t < best["queries"][qn]:
                        best["queries"][qn] = t
                        best["throughput"][qn] = r["throughput"].get(qn, best["throughput"].get(qn))
        results[c] = best
    eff = {}
    for q, t_small in results[base]["queries"].items():
        t_big = results[base * mult]["queries"][q]
        eff[q] = round((t_small / t_big) / mult, 3)
    rep = {
        "base_cpus": base,
        "big_cpus": base * mult,
        "times_base": results[base]["queries"],
        "times_big": results[base * mult]["queries"],
        "throughput_base": results[base]["throughput"],
        "throughput_big": results[base * mult]["throughput"],
        "scaling_efficiency": eff,
        "sf": results[base]["sf"],
        "n_points": results[base]["n_points"],
        "dims": results[base].get("dims", 2),
        # V3 introspection at scale (ring rounds / candidate rows / cover
        # cells / ann recall) — the at-scale runs are exactly where these
        # diagnose efficiency, not just sf0.1
        "stats_base": {
            "knn_stats": results[base].get("knn_stats"),
            "range_stats": results[base].get("range_stats"),
            "ann_recall_at_10": results[base].get("ann_recall_at_10"),
        },
        "stats_big": {
            "knn_stats": results[base * mult].get("knn_stats"),
            "range_stats": results[base * mult].get("range_stats"),
            "ann_recall_at_10": results[base * mult].get("ann_recall_at_10"),
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    out = os.environ.get("SPARK_GRAFT_SCALING_OUT", "BENCH/SCALING.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=2)
    return rep


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_suite()))
