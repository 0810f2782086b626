"""Round-2 operators: timestamped ingest, OOD/duplicate kNN, polygon report."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pkd_tree_spark import fixtures as FX
from pkd_tree_spark.config import EngineConfig
from pkd_tree_spark.documents import load_points
from pkd_tree_spark.index import SpatialIndex
from pkd_tree_spark.ingest import period_batches, read_timestamped_csv, write_timestamped_csv
from pkd_tree_spark.knn import knn
from pkd_tree_spark.ranges import range_count_polygons, range_report_polygons
from tests.conftest import SF_DIR

CFG = EngineConfig(dims=2, index_level=5, knn_level=4, partitions=8)


def test_timestamped_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "ts_csv")
    write_timestamped_csv(spark, SF_DIR, out)
    pts = read_timestamped_csv(spark, out)
    assert pts.columns == ["doc_id", "span_idx", "key", "x0", "x1", "ts"]
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert pts.count() == orders.count()
    # periods are chronological years covering the order dates
    batches = period_batches(pts)
    years = [r["y"] for r in orders.select(F.year("o_orderdate").alias("y")).distinct().collect()]
    assert len(batches) == len(years)
    assert sum(b.count() for b in batches) == orders.count()


def test_knn_duplicate_lattice_multiset(spark):
    """Thousands of identical points per site: k neighbors are k distinct
    ROWS (multiset semantics), ties broken by (dist2, key, span_idx)."""
    pts = load_points(spark, SF_DIR, dims=2, dist="uniform")
    lattice = pts.select(
        "doc_id", "span_idx", "key",
        (F.col("x0") % 4 * 250_000).alias("x0"),
        (F.col("x1") % 4 * 250_000).alias("x1"),
    )
    idx = SpatialIndex.build(lattice, CFG)
    res = knn(idx, FX.knn_fixtures(4, 2), k=10).toPandas()
    assert len(res) == 40
    for qid, grp in res.groupby("qid"):
        g = grp.sort_values("rn")
        # ranks are 1..10 and ordering is (dist2, key) non-decreasing
        assert list(g.rn) == list(range(1, 11))
        assert (np.diff(g.dist2.to_numpy()) >= 0).all()
        same = g[g.dist2 == g.dist2.iloc[0]]
        # tie-break by key (non-strict: lineitem carries duplicate keys —
        # the dummy-leaf multiplicity case — which yield equal rows)
        assert (np.diff(same.key.to_numpy()) >= 0).all()


def test_polygon_report_consistent_with_count(spark):
    pts = load_points(spark, SF_DIR, dims=2, dist="uniform")
    idx = SpatialIndex.build(pts, CFG)
    polys = FX.diamond_fixtures(8)[["qid", "vx", "vy"]]
    cnt = range_count_polygons(idx, polys).toPandas().set_index("qid")["cnt"]
    rep = range_report_polygons(idx, polys).groupBy("qid").count().toPandas().set_index("qid")["count"]
    for qid in cnt.index:
        assert int(cnt[qid]) == int(rep.get(qid, 0))


def test_knn_fixtures_varden_matches_oracle_formula():
    """numpy OOD fixture == the SQL varden formula (drift guard)."""
    import duckdb

    from pkd_tree_spark.oracle import knn_q_cte_varden

    want = FX.knn_fixtures_varden(64, 2)
    got = duckdb.connect().execute(
        f"WITH {knn_q_cte_varden(64, 2)} SELECT qid, q0, q1 FROM q ORDER BY qid"
    ).df()
    assert (want.sort_values("qid").reset_index(drop=True) == got).all().all()
