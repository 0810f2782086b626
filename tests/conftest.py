from __future__ import annotations

import pandas as pd
import pytest

from pkd_tree_spark.config import EngineConfig
from pkd_tree_spark.documents import load_points, synth_documents
from pkd_tree_spark.index import SpatialIndex
from pkd_tree_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="pkd-tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def cfg():
    return EngineConfig(dims=2, index_level=5, knn_level=4, partitions=8)


@pytest.fixture(scope="session")
def docs_uniform(spark):
    return synth_documents(spark, SF_DIR, dims=2, dist="uniform").persist()


@pytest.fixture(scope="session")
def points_uniform(spark) -> pd.DataFrame:
    """All base points as pandas — the brute-force oracle substrate."""
    return load_points(spark, SF_DIR, dims=2, dist="uniform").toPandas()


@pytest.fixture(scope="session")
def index_uniform(spark, cfg):
    return SpatialIndex.build(load_points(spark, SF_DIR, dims=2, dist="uniform"), cfg)


@pytest.fixture(scope="session")
def index_varden(spark, cfg):
    return SpatialIndex.build(load_points(spark, SF_DIR, dims=2, dist="varden"), cfg)


@pytest.fixture(scope="session")
def points_varden(spark) -> pd.DataFrame:
    return load_points(spark, SF_DIR, dims=2, dist="varden").toPandas()
