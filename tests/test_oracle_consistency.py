"""Guard against drift between fixtures.py (Python int formulas) and
oracle.py (the same formulas as SQL text): evaluate the SQL CTEs in DuckDB
and compare to the Python generators, and compare the SQL points CTE to the
Spark-side span pipeline."""

from __future__ import annotations

import duckdb
import pandas as pd

from pkd_tree_spark import fixtures as FX
from pkd_tree_spark import oracle as OR
from pkd_tree_spark.documents import load_points
from tests.conftest import SF_DIR


def _duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')")
    return con


def test_box_cte_matches_fixtures():
    got = _duck().execute(f"WITH {OR.box_cte(50, 2)} SELECT * FROM q ORDER BY qid").fetchdf()
    want = FX.box_fixtures(50, 2)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_ball_cte_matches_fixtures():
    got = _duck().execute(f"WITH {OR.ball_cte(50, 2)} SELECT * FROM q ORDER BY qid").fetchdf()
    want = FX.ball_fixtures(50, 2)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_knn_cte_matches_fixtures():
    got = _duck().execute(f"WITH {OR.knn_q_cte(50, 2)} SELECT * FROM q ORDER BY qid").fetchdf()
    want = FX.knn_fixtures(50, 2)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_diamond_cte_matches_fixtures():
    got = _duck().execute(f"WITH {OR.diamond_cte(50)} SELECT qid, c0, c1, r FROM q ORDER BY qid").fetchdf()
    want = FX.diamond_fixtures(50)[["qid", "c0", "c1", "r"]]
    pd.testing.assert_frame_equal(got.astype("int64"), want.reset_index(drop=True).astype("int64"))


def test_points_cte_matches_spark_pipeline(spark):
    """The decisive cross-check: DuckDB's arithmetic points == the points
    the Spark engine extracts from synthesized document spans."""
    for dist in ("uniform", "varden"):
        want = (
            load_points(spark, SF_DIR, dims=2, dist=dist)
            .toPandas()[["key", "x0", "x1"]]
            .sort_values(["key", "x0", "x1"])
            .reset_index(drop=True)
        )
        got = (
            _duck()
            .execute(f"WITH {OR.pts_cte(dist, 2)} SELECT key, x0, x1 FROM pts ORDER BY key, x0, x1")
            .fetchdf()
            .astype("int64")
        )
        pd.testing.assert_frame_equal(got, want.astype("int64"))
