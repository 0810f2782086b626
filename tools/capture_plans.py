"""Capture .explain('formatted') plans for the round-7 touched queries into
plans/r07/<query>_{before,after}.txt.

'after' runs against the working tree; 'before' runs the SAME capture
against a round-start checkout (git archive of the round-start commit into
a temp dir prepended to sys.path). Usage:

    python tools/capture_plans.py after
    python tools/capture_plans.py before <round-start-sha>

Plans are captured lazily (no jobs beyond tiny metadata actions), at
sf0.1 shapes. For kNN the ring loop runs per-round jobs, so the file
carries the round-1 candidate-join optimized plan (plan_log hook) plus the
final result frame's formatted plan.
"""

from __future__ import annotations

import io
import os
import subprocess
import sys
import tempfile
from contextlib import redirect_stdout

MODE = sys.argv[1] if len(sys.argv) > 1 else "after"
OUTDIR = os.path.join(os.path.dirname(__file__), "..", "plans", "r07")

if MODE == "before":
    sha = sys.argv[2]
    tmp = tempfile.mkdtemp(prefix="pkd_r6_checkout_")
    subprocess.run(
        f"git -C {os.path.dirname(__file__)}/.. archive {sha} | tar -x -C {tmp}",
        shell=True, check=True,
    )
    sys.path.insert(0, tmp)
else:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from pkd_tree_spark.config import EngineConfig  # noqa: E402
from pkd_tree_spark.documents import load_points  # noqa: E402
from pkd_tree_spark.index import SpatialIndex  # noqa: E402
from pkd_tree_spark.knn import auto_knn_level, knn  # noqa: E402
from pkd_tree_spark.ranges import range_count_boxes  # noqa: E402
from pkd_tree_spark.session import get_spark  # noqa: E402
from pkd_tree_spark.updates import merge_delete, merge_insert  # noqa: E402
from pkd_tree_spark import fixtures as FX  # noqa: E402

SF = "/root/testdata/sf0.1"
os.makedirs(OUTDIR, exist_ok=True)


def dump(name: str, text: str):
    with open(os.path.join(OUTDIR, f"{name}_{MODE}.txt"), "w") as f:
        f.write(text)
    print(f"wrote {name}_{MODE}.txt ({len(text)} bytes)")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


spark = get_spark(app="plan-capture", cpus=8)
spark.sparkContext.setLogLevel("ERROR")

cfg = EngineConfig(dims=2, index_level=7, knn_level=6, partitions=32)
pts = load_points(spark, SF, dims=2, dist="uniform")
ix = SpatialIndex.build(pts, cfg)
ix.points.count()
ix.meta.count()

# --- range count (1000 mixed boxes, the bench entry) ---
boxes = FX.box_fixtures(1000, 2)
dump("range_count_uniform", formatted(range_count_boxes(ix, boxes)))

# --- d=3 range count (budget change) ---
cfg3 = EngineConfig(dims=3, index_level=6, knn_level=5, partitions=32)
pts3 = load_points(spark, SF, dims=3, dist="uniform")
ix3 = SpatialIndex.build(pts3, cfg3)
ix3.points.count()
ix3.meta.count()
dump("range_count_d3", formatted(range_count_boxes(ix3, FX.box_fixtures(256, 3))))
ix3.release()

# --- kNN (bench query sample): round plans via plan_log + result frame ---
qdf = (
    ix.points.where(F.col("key") % 100 == 3)
    .select(F.col("key").alias("qid"), F.col("x0").alias("q0"), F.col("x1").alias("q1"))
    .dropDuplicates(["qid"])
)
plans: list = []
res = knn(ix, qdf, k=10, level=auto_knn_level(600_000, 2), plan_log=plans)
txt = formatted(res.groupBy().agg(F.sum("dist2")))
for i, p in enumerate(plans):
    txt += f"\n\n===== round {i+1} candidate-join optimized plan =====\n"
    txt += p["plan"]
    txt += f"\nlvl_counts: {p['lvl_counts']}\n"
dump("knn10_uniform", txt)

# --- batch delete 1% (broadcast anti-join path) ---
batch = ix.points.where(F.col("key") % 100 == 7).select(
    "doc_id", "span_idx", (F.col("key") + 3_000_000_000).alias("key"), "x0", "x1"
)
ins = merge_insert(ix, batch, persist=False)
dels = merge_delete(ins, batch, exact_rows=True, persist=False)
dump("batch_delete_1pct", formatted(dels.points))

# --- oversized delete (bucket-routed after / shuffled-hash before):
# force the over-broadcast branch by shrinking the gate so the 60k-key
# batch exercises the large-batch plan shape at sf0.1
import pkd_tree_spark.updates as U  # noqa: E402

orig = U.DELETE_BCAST_ROWS
U.DELETE_BCAST_ROWS = 1000
try:
    dels10 = merge_delete(ins, batch, exact_rows=True, persist=False)
    dump("batch_delete_large", formatted(dels10.points))
finally:
    U.DELETE_BCAST_ROWS = orig

# --- duplicate collapse (pruned table build probe + window) ---
lattice = pts.select(
    "doc_id", "span_idx", "key", *[(F.col(f"x{j}") % 20 * 52_631).alias(f"x{j}") for j in range(2)]
)
ixl = SpatialIndex.build(lattice, cfg)
ixl.points.count()
ixl.meta.count()
p = ixl.pruned_points(10)
dump("dedup_collapse", formatted(p) if p is not None else "refused (no pruned table)\n")
ixl.release()

print("done")
