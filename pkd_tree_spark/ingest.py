"""S6: timestamped point ingest + time-column-driven sliding window.

Reference analog: the OSM workflow — `script/osm.py:9-33` strips
timestamped lon/lat CSV rows into per-period point files, and
`tests/test.cpp:351-390` / `testFramework.h:817-869` replays them through a
5-period sliding window (insert period t, delete period t-5, probe between
steps).

Spark-first shape: a CSV reader with an explicit schema (header'ed CSV —
the osm.py output shape) feeding the same MERGE-based sliding-window driver
as the key-mod path; the period column comes from the TIME column
(year(ts)), not key arithmetic. At cluster scale the CSV is a directory of
many splits read in parallel; the deterministic writer below exists so the
path is exercised end-to-end from the driver testdata without external
data (coords derived from o_orderkey by the shared uniform formula, so the
DuckDB oracle re-derives them relationally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .documents import uniform_coord_col, varden_coord_col

__all__ = ["write_timestamped_csv", "read_timestamped_csv", "period_batches"]


def write_timestamped_csv(
    spark: SparkSession, sf_dir: str, out_path: str, dims: int = 2, dist: str = "uniform"
) -> None:
    """Deterministic timestamped point CSV from orders(o_orderkey,
    o_orderdate): key, ts, x0..x{d-1}. Stands in for the OSM extract."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    fn = uniform_coord_col if dist == "uniform" else varden_coord_col
    cols = [fn(k, j).alias(f"x{j}") for j in range(dims)]
    df = orders.select(k.alias("key"), F.col("o_orderdate").alias("ts"), *cols)
    df.write.mode("overwrite").option("header", True).csv(out_path)


def read_timestamped_csv(spark: SparkSession, path: str, dims: int = 2) -> DataFrame:
    """CSV -> points table with the engine's point schema: (doc_id,
    span_idx, key, x0..). An explicit schema keeps the scan one pass (no
    inference job) and types exact."""
    schema = "key long, ts timestamp, " + ", ".join(f"x{j} long" for j in range(dims))
    raw = spark.read.option("header", True).schema(schema).csv(path)
    return raw.select(
        F.concat(F.lit("osm_"), F.lpad(F.col("key").cast("string"), 12, "0")).alias("doc_id"),
        F.lit(0).cast("int").alias("span_idx"),
        "key",
        *[f"x{j}" for j in range(dims)],
        "ts",
    )


def period_batches(pts: DataFrame) -> list[DataFrame]:
    """Split a timestamped point table into per-period batches, period =
    year(ts), in chronological order. The distinct-period collect is O(one
    row per period) — years, not rows. Each batch drops the ts column so it
    flows through the standard MERGE pipeline."""
    per = pts.withColumn("period", F.year("ts"))
    periods = sorted(r["period"] for r in per.select("period").distinct().collect())
    cols = [c for c in pts.columns if c != "ts"]
    return [per.where(F.col("period") == p).select(*cols) for p in periods]
