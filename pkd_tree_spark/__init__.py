"""pkd_tree_spark — a from-scratch PySpark-native spatial indexing and
query engine with the query capabilities of ucrparlay/Pkd-tree (SIGMOD'25),
re-expressed Spark-first: Z-order cell grid over points extracted from
interleaved text+media document spans, range-partitioned on Morton prefixes,
queried via cell-prefix broadcast joins (range count/report, radius, convex
polygon, expanding-ring kNN) with MERGE-style batch updates and
imbalance-triggered re-tiling. See SURVEY.md for the full design blueprint.
"""

from .config import EngineConfig, DEFAULT_CONFIG  # noqa: F401
