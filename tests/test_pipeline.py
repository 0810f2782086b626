"""Training-data pipeline operators vs brute-force pandas/numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pkd_tree_spark.documents import synth_documents
from pkd_tree_spark.pipeline import dedup as DD
from pkd_tree_spark.pipeline import similarity as SIM
from pkd_tree_spark.pipeline import text as TX
from pkd_tree_spark.pipeline.multimodal import decode_media_stub, media_spans, with_media_binary
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def emb_q(emb):
    """Quantized embeddings as numpy (the oracle substrate)."""
    pdf = emb.toPandas()
    q = np.floor(np.stack(pdf["embedding"].to_numpy()).astype("float64") * 1000).astype("int64")
    return pdf["vec_id"].to_numpy(), q


def test_token_stats(docs, docs_pd):
    got = TX.token_stats(docs).toPandas().set_index("doc_id").sort_index()
    toks = docs_pd.set_index("doc_id")["text"].str.split(" ")
    assert (got["n_tokens"] == toks.map(len)).all()
    assert (got["n_distinct"] == toks.map(lambda t: len(set(t)))).all()
    assert (got["n_chars"] == docs_pd.set_index("doc_id")["text"].str.len()).all()


def test_lang_id_heuristic(docs, docs_pd):
    got = TX.lang_id(docs).toPandas().set_index("doc_id").sort_index()
    toks = docs_pd.set_index("doc_id")["text"].str.split(" ")
    stop = toks.map(lambda t: sum(x in TX.STOPWORDS for x in t) * 1000 // len(t))
    assert (got["stop_permille"] == stop).all()
    assert (got["pred_lang"] == np.where(stop >= TX.LANG_PERMILLE, "en", "unk")).all()


def test_fingerprint_order_sensitivity(spark):
    a = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "c b a"]}))
    fp = TX.fingerprint(a).toPandas().set_index("doc_id")["fp"]
    assert fp[1] != fp[2]  # permutation changes the fingerprint


def test_ngram_jaccard_vs_bruteforce(docs, docs_pd):
    got = DD.ngram_jaccard_pairs(docs).toPandas()
    toks = docs_pd.set_index("doc_id")["text"].str.split(" ")
    vocab = {t: i + 1 for i, t in enumerate(sorted({x for ts in toks for x in ts}))}
    tris = {
        d: {
            vocab[ts[i]] * 1_000_000 + vocab[ts[i + 1]] * 1_000 + vocab[ts[i + 2]]
            for i in range(len(ts) - 2)
        }
        for d, ts in toks.items()
    }
    want = set()
    ids = sorted(tris)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(tris[a] & tris[b])
            if inter and inter * 1000 // len(tris[a] | tris[b]) >= DD.TRIGRAM_JACCARD_PERMILLE:
                want.add((a, b))
    assert set(zip(got.doc_a, got.doc_b)) == want


def test_minhash_lsh_recall_of_true_dups(spark):
    """Docs that are exact near-copies must collide in at least one band."""
    base = "spark table join filter scan agg window sort group merge batch stream " * 4
    rows = [{"doc_id": i, "text": base + f"tail{i % 2}"} for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    pairs = DD.minhash_lsh_pairs(df).toPandas()
    # same-tail docs share all shingles except the last two -> must collide
    same = {(a, b) for a in range(10) for b in range(a + 1, 10) if a % 2 == b % 2}
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert same <= got


def test_simhash_similar_docs_close(spark):
    rows = [
        {"doc_id": 1, "text": "spark table join filter scan agg window sort"},
        {"doc_id": 2, "text": "spark table join filter scan agg window group"},
        {"doc_id": 3, "text": "alpha beta gamma delta epsilon zeta eta theta"},
    ]
    sim = DD.simhash(spark.createDataFrame(pd.DataFrame(rows))).toPandas().set_index("doc_id")["sim"]
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(sim[1], sim[2]) < ham(sim[1], sim[3])


def test_topk_dot_vs_bruteforce(emb, emb_q):
    ids, q = emb_q
    got = SIM.topk_dot(emb, n_queries=8, k=5).toPandas()
    order = np.argsort(ids)
    for qid in range(8):
        qv = q[ids == qid][0]
        dots = q @ qv
        cand = sorted(zip(-dots, ids))
        cand = [(d, v) for d, v in cand if v != qid][:5]
        want = [v for _, v in cand]
        g = got[got.qid == qid].sort_values("rn")["vec_id"].tolist()
        assert g == want


def test_ann_lsh_recall(emb, emb_q):
    """LSH ANN recall@10 vs exact top-10 — sanity floor, not a tight bound."""
    exact = SIM.topk_dot(emb, n_queries=16, k=10).toPandas()
    approx = SIM.ann_lsh(emb, n_queries=16, k=10).toPandas()
    recalls = []
    for qid in exact.qid.unique():
        e = set(exact[exact.qid == qid].vec_id)
        a = set(approx[approx.qid == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    # 8 tables x 6 planes, Hamming-2 multiprobe: 0.938 measured at sf0.001
    # (0.96 at sf0.1, logged per bench run as ann_recall_at_10)
    assert np.mean(recalls) >= 0.85


def test_ann_lsh_adaptive_planes(spark, emb):
    """r7: the LSH plane count tracks corpus size. Fixed 6 planes = 64
    buckets/table packs ~16k vectors per bucket at a 1M-row corpus, so the
    bucket equi-join degenerates toward all-pairs (measured: a 4096-query
    probe join emitted ~10^10 candidate pairs and wedged). Small corpora
    (every sf gate/bench size) keep the historical 6 — bit-identical."""
    assert SIM.auto_planes(0) == 6
    assert SIM.auto_planes(500) == 6
    assert SIM.auto_planes(2000) == 6  # sf0.1 bench corpus: unchanged
    assert SIM.auto_planes(16_000) == 7
    assert SIM.auto_planes(1_024_000) == 13
    # behavior: a 16k-row near-replica corpus engages the 7-plane code and
    # still clears the recall floor vs the exact ranker on the SAME corpus
    reps = 32
    big = (
        spark.range(reps)
        .crossJoin(emb)
        .select(
            (F.col("vec_id") + F.col("id") * 100_000).alias("vec_id"),
            F.transform("embedding", lambda x: x + F.col("id").cast("float") * F.lit(0.001)).alias(
                "embedding"
            ),
            "label",
        )
        .persist()
    )
    try:
        exact = SIM.topk_dot(big, n_queries=8, k=10).toPandas()
        approx = SIM.ann_lsh(big, n_queries=8, k=10).toPandas()
        recalls = []
        for qid in exact.qid.unique():
            e = set(exact[exact.qid == qid].vec_id)
            a = set(approx[approx.qid == qid].vec_id)
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.8
    finally:
        big.unpersist()


def test_ann_lsh_bucket_gemm_matches_pair_join(spark, emb):
    """r7: ann_lsh's per-bucket GEMM re-rank (lossless per-(query, bucket)
    top-k before the global window) must be bit-identical to the
    candidate-pair join + per-pair exact HOF dot it replaced — same
    buckets, same probes, same exact int64 dots, same (-dot, vec_id)
    tie-break."""
    import pkd_tree_spark.pipeline.similarity as S
    from pyspark.sql import Window

    base = S.quantized_embeddings(emb)
    m2, n = S._corpus_stats(base)
    n_planes, n_tables, nq, k = S.auto_planes(n), 8, 16, 10
    dkeys = S._table_keys_udf(n_planes, n_tables, m2, aug_zero=False)(
        F.col("qv"), F.col("norm2")
    )
    corpus = base.select("vec_id", F.explode(dkeys).alias("bucket"))
    qbase = base.where(F.col("vec_id") < nq)
    qkeys = S._table_keys_udf(n_planes, n_tables, m2, aug_zero=True)(
        F.col("qv"), F.col("norm2")
    )
    masks = (
        [0]
        + [1 << p for p in range(n_planes)]
        + [(1 << p) | (1 << p2) for p in range(n_planes) for p2 in range(p + 1, n_planes)]
    )
    qprobe = (
        qbase.select(F.col("vec_id").alias("qid"), F.explode(qkeys).alias("b0"))
        .select("qid", "b0", F.explode(F.array(*[F.lit(m) for m in masks])).alias("mask"))
        .select("qid", F.col("b0").bitwiseXOR(F.col("mask")).alias("bucket"))
    )
    cand_ids = (
        corpus.join(F.broadcast(qprobe), "bucket")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    qq = qbase.select(F.col("vec_id").alias("qid"), F.col("qv").alias("qq"))
    cand = (
        cand_ids.join(base.select("vec_id", "qv"), "vec_id")
        .join(F.broadcast(qq), "qid")
        .select("qid", "vec_id", S._dot("qq", "qv").alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("vec_id"))
    want = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", F.col("rn").cast("long").alias("rn"), "vec_id", "dot")
        .toPandas()
        .sort_values(["qid", "rn"])
        .reset_index(drop=True)
    )
    got = (
        S.ann_lsh(emb, n_queries=nq, k=k)
        .toPandas()
        .sort_values(["qid", "rn"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_embedding_dup_pairs_exact(emb, emb_q):
    ids, q = emb_q
    got = DD.embedding_dup_pairs(emb).toPandas()
    n2 = (q * q).sum(axis=1)
    dots = q @ q.T
    t2 = DD.EMB_DUP_PERMILLE**2
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and dots[i, j] > 0:
                if int(dots[i, j]) ** 2 * 1_000_000 >= t2 * int(n2[i]) * int(n2[j]):
                    want.add((ids[i], ids[j]))
    assert set(zip(got.vec_a, got.vec_b)) == want


def test_media_decode_stub(spark):
    docs = synth_documents(spark, SF_DIR, dims=2, dist="uniform")
    media = media_spans(docs)
    out = decode_media_stub(with_media_binary(media)).toPandas()
    assert len(out) == media.count()
    # deterministic fake decode: recompute from the hex handle
    h = out["media_ref"].str.slice(8).apply(int, base=16)
    assert (out["width"] == 320 + h % 1600).all()
    assert (out["height"] == 240 + (h // 7) % 900).all()
    assert (out["n_bytes"] == 96).all()
    # binary plumbing: content bytes really flowed through mapInPandas
    assert out["n_frames"].between(1, 240).all()


def test_no_single_partition_window_in_text_plans(docs):
    """Token ids are hash-computed inline (text.tok_id_col): no operator in
    the fingerprint/minhash/simhash plans may funnel the vocabulary through
    a single partition (the round-1 Window.orderBy anti-pattern)."""
    for df in (
        TX.fingerprint(docs),
        DD.minhash_lsh_pairs(docs),
        DD.simhash(docs),
        DD.ngram_jaccard_pairs(docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        assert "Window" not in plan
