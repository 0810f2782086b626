"""Driver contract for the spark-graft builder (PySpark target).

Each queries()[name] runs the FULL engine pipeline at sf_dir: synthesize
the spans-document table (deterministic int64 arithmetic from lineitem
keys), extract points from geo spans, Morton-encode + range-partition,
build cell metadata, then answer the query through the two-branch
(metadata-interior + boundary-scan) plan or the expanding-ring kNN join.
The matching oracle_sql()[name] recomputes the same points/queries by
plain arithmetic over the pre-registered DuckDB views and answers
relationally — the CGAL-differential role of tests/checkCorrectParallel.cpp.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pkd_tree_spark import oracle as OR
from pkd_tree_spark import fixtures as FX
from pkd_tree_spark.config import EngineConfig
from pkd_tree_spark.documents import synth_documents, extract_points, load_points
from pkd_tree_spark.index import SpatialIndex
from pkd_tree_spark.knn import auto_knn_level, knn
from pkd_tree_spark.ranges import (
    range_count_balls,
    range_count_boxes,
    range_count_polygons,
    range_report_balls,
    range_report_boxes,
    range_report_polygons,
)
from pkd_tree_spark.updates import merge_delete, merge_insert, sliding_window
from pkd_tree_spark import oracle_pipeline as ORP
from pkd_tree_spark.pipeline import dedup as DD
from pkd_tree_spark.pipeline import similarity as SIM
from pkd_tree_spark.pipeline import text as TX
from pkd_tree_spark.pipeline.multimodal import decode_media_stub, media_spans, with_media_binary

D = 2
NQ_BOX, NQ_BALL, NQ_POLY, NQ_KNN, KNN_K = 64, 64, 32, 32, 10
CELL_LEVEL = 5
WINDOW_LEVEL = 4
WINDOW_LEN = 5

_CFG = EngineConfig(dims=D, index_level=6, knn_level=5, partitions=32)
_CFG3 = EngineConfig(dims=3, index_level=4, knn_level=3, partitions=32)
_CFG5 = EngineConfig(dims=5, index_level=3, knn_level=2, partitions=32)
_CFG7 = EngineConfig(dims=7, index_level=2, knn_level=1, partitions=32)  # grid_bits=63//7=9
# d=16 = the reference's max instantiation (tests/test.cpp:569-617).
# grid_bits=63//16=3: the cell tree is shallow and the cover budget stops
# descent early, so range queries degrade toward predicate scans — the same
# curse-of-dimensionality regime the kd-tree itself hits at d=16.
_CFG16 = EngineConfig(dims=16, index_level=1, knn_level=1, partitions=32)


def _build(spark: SparkSession, sf_dir: str, dist: str, dims: int = D) -> SpatialIndex:
    cfg = {2: _CFG, 3: _CFG3, 5: _CFG5, 7: _CFG7, 16: _CFG16}[dims]
    return SpatialIndex.build(load_points(spark, sf_dir, dims=dims, dist=dist), cfg)


D16_HW_BASE = 300_000  # selectivity ~ (2hw/M)^d: wide boxes keep d=16 counts non-zero


def _q_count_box_dn(dist: str, dims: int, hw_base: int | None = None):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return range_count_boxes(
            _build(spark, sf_dir, dist, dims=dims), FX.box_fixtures(NQ_BOX, dims, hw_base)
        )
    return fn


def _q_knn_dn(dist: str, dims: int):
    """kNN at the reference's higher instantiation dims (tests/test.cpp:
    569-617, script/run_highDim.sh runs up to d=16). d<=5 stays on the
    mesh/shell path; d=7 rings once then goes exhaustive; d=16 is
    exhaustive from round 1 (mesh 3^16 > MESH_CAP) — the same
    curse-of-dimensionality degradation the kd-tree itself exhibits."""
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = _build(spark, sf_dir, dist, dims=dims)
        n = idx.points.count()
        res = knn(idx, FX.knn_fixtures(NQ_KNN, dims), k=KNN_K, level=auto_knn_level(n, dims))
        return res.select("qid", "rn", "key", "dist2")
    return fn


def _q_raster_to_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pkd_tree_spark.raster import rasterize, raster_to_vector

    idx = _build(spark, sf_dir, "uniform")
    return raster_to_vector(rasterize(idx, CELL_LEVEL), CELL_LEVEL, threshold=2, cfg=idx.cfg)


def _q_vector_to_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pkd_tree_spark.raster import vector_to_raster

    return vector_to_raster(spark, FX.diamond_fixtures(NQ_POLY), CELL_LEVEL, _CFG)


def _q_tile_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pkd_tree_spark.raster import tile_assignments

    return tile_assignments(_build(spark, sf_dir, "uniform"), CELL_LEVEL)


def _q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 analog: kNN-graph edges of a 1% key-sample against the index."""
    from pkd_tree_spark.knn import knn_join

    idx = _build(spark, sf_dir, "uniform")
    return knn_join(idx, k=5).select("qid", "rn", F.col("key").alias("dst"), "dist2")


def _insert_batch(spark: SparkSession, sf_dir: str, dist: str) -> DataFrame:
    """Fresh documents keyed 10_000_000 + o_orderkey — the update batch goes
    through the same spans pipeline as the base table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = orders.select((F.lit(FX.INSERT_KEY_OFFSET) + F.col("o_orderkey")).cast("long").alias("k"))
    return extract_points(synth_documents(spark, sf_dir, dims=D, dist=dist, keys_df=keys), dims=D)


def _updated_index(spark: SparkSession, sf_dir: str, dist: str, state: str) -> SpatialIndex:
    idx = _build(spark, sf_dir, dist)
    if state in ("inserted", "updated"):
        idx = merge_insert(idx, _insert_batch(spark, sf_dir, dist))
    if state == "updated":
        dels = idx.points.where(F.col("key") % FX.DELETE_MOD == 0).select("key").distinct()
        idx = merge_delete(idx, dels)
    return idx


def _grid_cells(idx: SpatialIndex, level: int) -> DataFrame:
    shift = idx.cfg.grid_bits - level
    return (
        idx.points.select(*[F.shiftrightunsigned(f"x{j}", shift).alias(f"g{j}") for j in range(D)])
        .groupBy(*[f"g{j}" for j in range(D)])
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --- spatial query callables -------------------------------------------------

def _q_cells(dist: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _grid_cells(_build(spark, sf_dir, dist), CELL_LEVEL)
    return fn


def _q_count_box(dist: str, state: str = "base"):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = _updated_index(spark, sf_dir, dist, state)
        return range_count_boxes(idx, FX.box_fixtures(NQ_BOX, D))
    return fn


def _q_count_ball(dist: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return range_count_balls(_build(spark, sf_dir, dist), FX.ball_fixtures(NQ_BALL, D))
    return fn


def _q_report_box(dist: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return range_report_boxes(_build(spark, sf_dir, dist), FX.box_fixtures(16, D))
    return fn


def _q_report_ball(dist: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return range_report_balls(_build(spark, sf_dir, dist), FX.ball_fixtures(16, D))
    return fn


def _q_incremental_build(dist: str):
    """U7 incremental build: insert in 4 steps until full; final grid state
    must equal a from-scratch build's (the oracle computes the full state)."""
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        pts = load_points(spark, sf_dir, dims=D, dist=dist)
        idx = SpatialIndex.build(pts.where(F.col("key") % 4 == 0), _CFG)
        for step in (1, 2, 3):
            idx = merge_insert(idx, pts.where(F.col("key") % 4 == step))
        return _grid_cells(idx, CELL_LEVEL)
    return fn


def _q_count_polygon(dist: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        polys = FX.diamond_fixtures(NQ_POLY)[["qid", "vx", "vy"]]
        return range_count_polygons(_build(spark, sf_dir, dist), polys)
    return fn


def _q_count_box_deleted_rows(dist: str):
    """U4 via the point-batch contract (batch_delete.hpp:59-76): delete the
    EXACT rows read from the index with exact_rows=True — the meta delta
    aggregates the batch (no semi-join) and the anti-join broadcasts, so a
    metadata-delta bug here flips the interior counts the oracle checks."""
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = _build(spark, sf_dir, dist)
        idx = merge_insert(idx, _insert_batch(spark, sf_dir, dist))
        rows = idx.points.where(F.col("key") % FX.DELETE_MOD == 0).select(
            "key", "span_idx", *[f"x{j}" for j in range(D)]
        )
        idx = merge_delete(idx, rows, exact_rows=True)
        return range_count_boxes(idx, FX.box_fixtures(NQ_BOX, D))
    return fn


def _q_count_box_cow_deleted(dist: str):
    """COW delete roundtrip (batch_delete.hpp:146-265 rewrites only touched
    subtrees): persist the index, merge_delete_cow every row of the corner
    pbucket (exact rows read back from disk), reload, range count — the
    oracle sees the corner box emptied; the targeted meta refresh and the
    emptied-bucket directory removal are both on the checked path."""
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        import shutil
        import tempfile

        from pkd_tree_spark.updates import PersistentIndex

        tmp = tempfile.mkdtemp(prefix="pkd_cow_")
        try:
            idx = _build(spark, sf_dir, dist)
            p = PersistentIndex(path=tmp, cfg=idx.cfg)
            p.write(idx)
            corner = 1 << (idx.cfg.coord_bits - p.bucket_level)  # pbucket 0 box
            pred = None
            for j in range(D):
                c = F.col(f"x{j}") < corner
                pred = c if pred is None else pred & c
            victims = p.load(spark).points.where(pred).select(
                "key", "span_idx", *[f"x{j}" for j in range(D)]
            ).localCheckpoint(eager=True)  # snapshot before the files are rewritten
            p.merge_delete_cow(spark, victims)
            # materialize before the index directory is removed
            return range_count_boxes(p.load(spark), FX.box_fixtures(NQ_BOX, D)).localCheckpoint(
                eager=True
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return fn


def _q_knn(dist: str, state: str = "base", k: int = KNN_K):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = _updated_index(spark, sf_dir, dist, state)
        n = idx.points.count()
        res = knn(idx, FX.knn_fixtures(NQ_KNN, D), k=k, level=auto_knn_level(n, D))
        return res.select("qid", "rn", "key", "dist2")
    return fn


DUP_SITES, DUP_MULT = 20, 52_631  # duplicate-heavy lattice (dummy-leaf regime)


def _q_knn_ood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 OOD kNN (tests/test.cpp:494-509): varden-distributed queries over
    the uniform index — the cross-distribution case."""
    idx = _build(spark, sf_dir, "uniform")
    n = idx.points.count()
    res = knn(idx, FX.knn_fixtures_varden(NQ_KNN, D), k=KNN_K, level=auto_knn_level(n, D))
    return res.select("qid", "rn", "key", "dist2")


def _q_knn_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-collapse regime (dummy leaves, build_tree.hpp:183-186):
    coords snapped onto a 20^2 lattice — thousands of identical points per
    site; multiset kNN semantics with deterministic tie-break."""
    pts = load_points(spark, sf_dir, dims=D, dist="uniform")
    lattice = pts.select(
        "doc_id", "span_idx", "key",
        *[(F.col(f"x{j}") % DUP_SITES * DUP_MULT).alias(f"x{j}") for j in range(D)],
    )
    idx = SpatialIndex.build(lattice, _CFG)
    n = idx.points.count()
    res = knn(idx, FX.knn_fixtures(NQ_KNN, D), k=KNN_K, level=auto_knn_level(n, D))
    return res.select("qid", "rn", "key", "dist2")


def _q_report_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys = FX.diamond_fixtures(16)[["qid", "vx", "vy"]]
    return range_report_polygons(_build(spark, sf_dir, "uniform"), polys)


def _q_sliding_window_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 analog: timestamped CSV ingest; the sliding window is driven by
    the TIME column (period = year(ts)), not key arithmetic."""
    import shutil
    import tempfile

    from pkd_tree_spark.ingest import period_batches, read_timestamped_csv, write_timestamped_csv

    tmp = tempfile.mkdtemp(prefix="pkd_ts_csv_")
    try:
        write_timestamped_csv(spark, sf_dir, tmp, dims=D)
        pts = read_timestamped_csv(spark, tmp, dims=D)
        nots = pts.drop("ts")
        idx = SpatialIndex.build(nots.where(F.lit(False)), _CFG)  # start empty
        idx = sliding_window(idx, period_batches(pts), window_len=WINDOW_LEN)
        # materialize the (small) grid before deleting the CSV it reads from
        return _grid_cells(idx, WINDOW_LEVEL).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_sliding_window(dist: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        pts = load_points(spark, sf_dir, dims=D, dist=dist)
        period = F.col("key") % FX.SLIDING_PERIODS
        idx = SpatialIndex.build(pts.where(F.lit(False)), _CFG)  # start empty
        batches = [pts.where(period == t) for t in range(FX.SLIDING_PERIODS)]
        idx = sliding_window(idx, batches, window_len=WINDOW_LEN)
        return _grid_cells(idx, WINDOW_LEVEL)
    return fn


# --- training-data pipeline callables (driver documents/embeddings tables) ---

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_events_hourly_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic relational breadth: per event_type, the top-5 busiest hours
    (window rank over an hourly aggregate; integer outputs only)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd HH").alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("event_id").alias("min_eid"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("cnt").desc(), F.col("hour"))
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("event_type", "hour", "cnt", "min_eid", F.col("rn").cast("long").alias("rn"))
    )


_EVENTS_HOURLY_SQL = (
    "WITH hourly AS ("
    "  SELECT event_type, strftime(ts, '%Y-%m-%d %H') AS hour, "
    "         CAST(count(*) AS BIGINT) AS cnt, min(event_id) AS min_eid "
    "  FROM events GROUP BY 1, 2) "
    "SELECT event_type, hour, cnt, min_eid, rn FROM ("
    "  SELECT *, CAST(row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, hour) AS BIGINT) AS rn "
    "  FROM hourly) WHERE rn <= 5"
)


def _q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = synth_documents(spark, sf_dir, dims=D, dist="uniform")
    return decode_media_stub(with_media_binary(media_spans(docs)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: rectangle range count over the Z-order index at sf0.001."""
    idx = _build(spark, "/root/testdata/sf0.001", "uniform")
    return range_count_boxes(idx, FX.box_fixtures(16, D))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "spatial_cells_uniform": _q_cells("uniform"),
        "spatial_cells_varden": _q_cells("varden"),
        "spatial_range_count_box_uniform": _q_count_box("uniform"),
        "spatial_range_count_box_varden": _q_count_box("varden"),
        "spatial_range_count_ball_uniform": _q_count_ball("uniform"),
        "spatial_range_count_ball_varden": _q_count_ball("varden"),
        "spatial_range_report_box_uniform": _q_report_box("uniform"),
        "spatial_range_report_ball_varden": _q_report_ball("varden"),
        "spatial_incremental_build_cells": _q_incremental_build("uniform"),
        "spatial_range_count_polygon_uniform": _q_count_polygon("uniform"),
        "spatial_range_count_polygon_varden": _q_count_polygon("varden"),
        "spatial_knn_uniform": _q_knn("uniform"),
        "spatial_knn_varden": _q_knn("varden"),
        "spatial_knn_after_update": _q_knn("uniform", state="updated"),
        "spatial_range_count_box_inserted": _q_count_box("uniform", state="inserted"),
        "spatial_range_count_box_updated": _q_count_box("uniform", state="updated"),
        "spatial_range_count_box_deleted_rows": _q_count_box_deleted_rows("uniform"),
        "spatial_range_count_box_cow_deleted": _q_count_box_cow_deleted("uniform"),
        "spatial_sliding_window_cells": _q_sliding_window("uniform"),
        "spatial_sliding_window_time": _q_sliding_window_time,
        "spatial_range_count_box_d3": _q_count_box_dn("uniform", 3),
        "spatial_range_count_box_d5": _q_count_box_dn("uniform", 5),
        "spatial_range_count_box_d7": _q_count_box_dn("uniform", 7),
        "spatial_range_count_box_d16": _q_count_box_dn("uniform", 16, hw_base=D16_HW_BASE),
        "spatial_knn_d3": _q_knn_dn("uniform", 3),
        "spatial_knn_d5": _q_knn_dn("uniform", 5),
        "spatial_knn_d7": _q_knn_dn("uniform", 7),
        "spatial_knn_d16": _q_knn_dn("uniform", 16),
        "spatial_knn_k1": _q_knn("uniform", k=1),
        "spatial_knn_k100": _q_knn("uniform", k=100),
        "spatial_knn_ood": _q_knn_ood,
        "spatial_knn_dup": _q_knn_dup,
        "spatial_range_report_polygon_uniform": _q_report_polygon,
        "spatial_knn_graph": _q_knn_graph,
        "spatial_raster_to_vector": _q_raster_to_vector,
        "spatial_vector_to_raster": _q_vector_to_raster,
        "spatial_tile_assignments": _q_tile_assignments,
        # training-data pipeline operators
        "pipe_token_stats": lambda s, d_: TX.token_stats(_docs(s, d_)),
        "pipe_lang_id": lambda s, d_: TX.lang_id(_docs(s, d_)),
        "pipe_fingerprint": lambda s, d_: TX.fingerprint(_docs(s, d_)),
        "pipe_exact_dup": lambda s, d_: DD.exact_dup_groups(_docs(s, d_)),
        "pipe_ngram_jaccard": lambda s, d_: DD.ngram_jaccard_pairs(_docs(s, d_)),
        "pipe_minhash_lsh": lambda s, d_: DD.minhash_lsh_pairs(_docs(s, d_)),
        "pipe_simhash": lambda s, d_: DD.simhash(_docs(s, d_)),
        "pipe_topk_dot": lambda s, d_: SIM.topk_dot(_emb(s, d_)),
        "pipe_embedding_dup": lambda s, d_: DD.embedding_dup_pairs(_emb(s, d_)),
        "pipe_ann_lsh": lambda s, d_: SIM.ann_lsh(_emb(s, d_)),  # approximate: rows-only check
        "pipe_media_decode": _q_media_decode,
        "pipe_events_hourly_top": _q_events_hourly_top,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "spatial_cells_uniform": OR.cells_sql(CELL_LEVEL, D, "uniform"),
        "spatial_cells_varden": OR.cells_sql(CELL_LEVEL, D, "varden"),
        "spatial_range_count_box_uniform": OR.range_count_box_sql(NQ_BOX, D, "uniform"),
        "spatial_range_count_box_varden": OR.range_count_box_sql(NQ_BOX, D, "varden"),
        "spatial_range_count_ball_uniform": OR.range_count_ball_sql(NQ_BALL, D, "uniform"),
        "spatial_range_count_ball_varden": OR.range_count_ball_sql(NQ_BALL, D, "varden"),
        "spatial_range_report_box_uniform": OR.range_report_box_sql(16, D, "uniform"),
        "spatial_range_report_ball_varden": OR.range_report_ball_sql(16, D, "varden"),
        "spatial_incremental_build_cells": OR.cells_sql(CELL_LEVEL, D, "uniform"),
        "spatial_range_count_polygon_uniform": OR.range_count_diamond_sql(NQ_POLY, "uniform"),
        "spatial_range_count_polygon_varden": OR.range_count_diamond_sql(NQ_POLY, "varden"),
        "spatial_knn_uniform": OR.knn_sql(NQ_KNN, KNN_K, D, "uniform"),
        "spatial_knn_varden": OR.knn_sql(NQ_KNN, KNN_K, D, "varden"),
        "spatial_knn_after_update": OR.knn_sql(NQ_KNN, KNN_K, D, "uniform", state="updated"),
        "spatial_range_count_box_inserted": OR.range_count_box_updated_sql(NQ_BOX, D, "uniform", "inserted"),
        "spatial_range_count_box_updated": OR.range_count_box_updated_sql(NQ_BOX, D, "uniform", "updated"),
        "spatial_range_count_box_deleted_rows": OR.range_count_box_updated_sql(NQ_BOX, D, "uniform", "updated"),
        "spatial_range_count_box_cow_deleted": OR.range_count_box_corner_deleted_sql(NQ_BOX, D, "uniform"),
        "spatial_sliding_window_cells": OR.sliding_window_cells_sql(WINDOW_LEVEL, WINDOW_LEN, D, "uniform"),
        "spatial_sliding_window_time": OR.sliding_window_time_cells_sql(WINDOW_LEVEL, WINDOW_LEN, D),
        "spatial_range_count_box_d3": OR.range_count_box_sql(NQ_BOX, 3, "uniform"),
        "spatial_range_count_box_d5": OR.range_count_box_sql(NQ_BOX, 5, "uniform"),
        "spatial_range_count_box_d7": OR.range_count_box_sql(NQ_BOX, 7, "uniform"),
        "spatial_range_count_box_d16": OR.range_count_box_sql(NQ_BOX, 16, "uniform", hw_base=D16_HW_BASE),
        "spatial_knn_d3": OR.knn_sql(NQ_KNN, KNN_K, 3, "uniform"),
        "spatial_knn_d5": OR.knn_sql(NQ_KNN, KNN_K, 5, "uniform"),
        "spatial_knn_d7": OR.knn_sql(NQ_KNN, KNN_K, 7, "uniform"),
        "spatial_knn_d16": OR.knn_sql(NQ_KNN, KNN_K, 16, "uniform"),
        "spatial_knn_k1": OR.knn_sql(NQ_KNN, 1, D, "uniform"),
        "spatial_knn_k100": OR.knn_sql(NQ_KNN, 100, D, "uniform"),
        "spatial_knn_ood": OR.knn_sql(NQ_KNN, KNN_K, D, "uniform", qdist="varden"),
        "spatial_knn_dup": OR.knn_dup_sql(NQ_KNN, KNN_K, D, "uniform", DUP_SITES, DUP_MULT),
        "spatial_range_report_polygon_uniform": OR.range_report_diamond_sql(16, "uniform"),
        "spatial_knn_graph": OR.knn_graph_sql(5, D, "uniform"),
        "spatial_raster_to_vector": OR.raster_to_vector_sql(CELL_LEVEL, 2, D, "uniform"),
        "spatial_vector_to_raster": OR.vector_to_raster_sql(NQ_POLY, CELL_LEVEL),
        "spatial_tile_assignments": OR.tile_assignments_sql(CELL_LEVEL, D, "uniform"),
        "pipe_token_stats": ORP.token_stats_sql(),
        "pipe_lang_id": ORP.lang_id_sql(),
        "pipe_fingerprint": ORP.fingerprint_sql(),
        "pipe_exact_dup": ORP.exact_dup_sql(),
        "pipe_ngram_jaccard": ORP.ngram_jaccard_sql(),
        "pipe_minhash_lsh": ORP.minhash_lsh_sql(),
        "pipe_simhash": ORP.simhash_sql(),
        "pipe_topk_dot": ORP.topk_dot_sql(),
        "pipe_embedding_dup": ORP.embedding_dup_sql(),
        # pipe_ann_lsh intentionally has no oracle (approximate operator)
        "pipe_media_decode": ORP.media_decode_sql(),
        "pipe_events_hourly_top": _EVENTS_HOURLY_SQL,
    }
