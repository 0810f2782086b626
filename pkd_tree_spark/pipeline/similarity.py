"""Similarity search over the ``embeddings`` table.

  topk_dot  — exact brute-force top-k by integer dot product (MIPS) on
              fixed-point-quantized vectors: the correctness baseline,
              broadcast queries x full scan, deterministic tie-break.
  ann_lsh   — random-hyperplane LSH buckets (deterministic +/-1 planes),
              candidates = bucket equi-join (multi-probe over all tables),
              exact re-rank inside buckets: the scale path. Approximate by
              construction -> no SQL oracle; recall is pytest-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import A1, A2
from .dedup import quantized_embeddings

__all__ = ["topk_dot", "ann_lsh", "lsh_bucket_col"]


def _dot(qcol: str, vcol: str):
    return F.aggregate(
        F.zip_with(qcol, vcol, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def topk_dot(emb: DataFrame, n_queries: int = 16, k: int = 10) -> DataFrame:
    """Exact top-k inner-product neighbors for the first ``n_queries``
    vec_ids. (qid, rn, vec_id, dot), rn ordered by (-dot, vec_id), self
    excluded. Plan: broadcast tiny query side -> one scan, window top-k."""
    q = quantized_embeddings(emb)
    queries = q.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qq")
    )
    cand = (
        q.join(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _dot("qq", "qv").alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", F.col("rn").cast("long").alias("rn"), "vec_id", "dot")
    )


def lsh_bucket_col(qv_col: str, n_planes: int = 8):
    """Deterministic random-hyperplane bucket id: plane p has weight
    s_ip = +1 if ((i*A1 + p*A2) >> 7) % 2 == 0 else -1 on dim i; bit p of
    the bucket = (sum_i s_ip * qv_i) >= 0. Pure JVM higher-order exprs."""
    def _signed_fn(p: int):
        def fn(x, i):
            plane = F.floor((i.cast("long") * F.lit(A1) + F.lit(p) * F.lit(A2)) / F.lit(128)) % 2 == 0
            return F.when(plane, x).otherwise(-x)

        return fn

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        signed = F.transform(qv_col, _signed_fn(p))
        tot = F.aggregate(signed, F.lit(0).cast("long"), lambda acc, x: acc + x)
        bucket = bucket + F.when(tot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_lsh(emb: DataFrame, n_queries: int = 16, k: int = 10, n_planes: int = 6) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket equi-join + exact integer
    re-rank, multi-probe (own bucket + all Hamming-1 neighbors — vectors
    near a hyperplane land on either side, probing flipped bits recovers
    them). Output shape == topk_dot (rn may be < k if buckets are small).
    At 100TB the bucketed join replaces topk_dot's full scan; recall is
    pytest-checked against the exact baseline."""
    q = quantized_embeddings(emb).withColumn("bucket", lsh_bucket_col("qv", n_planes))
    probes = F.array(F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])
    queries = (
        q.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("qid"), F.col("qv").alias("qq"), F.explode(probes).alias("bucket"))
    )
    cand = (
        q.join(F.broadcast(queries), "bucket")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _dot("qq", "qv").alias("dot"))
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", F.col("rn").cast("long").alias("rn"), "vec_id", "dot")
    )
