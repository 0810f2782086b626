"""Deduplication operators over ``documents``:

  exact          — hash-groupBy on content
  n-gram Jaccard — token-trigram shingles, self-join, exact set Jaccard
  MinHash + LSH  — shingle -> minhash signature -> banded bucket join
  SimHash        — 16-bit sign-of-sum sketch over token hashes
  embedding near-dup — exact integer cosine^2 threshold on quantized vectors

Candidate generation is always an equi-join (shingle / band bucket /
simhash), never a cross join — the property that survives 100x scale-up.
All outputs are integers/strings; Jaccard and cosine thresholds are
evaluated in exact integer arithmetic (decimal for the cosine cross-
multiplication) so the DuckDB differential check is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import A1
from .text import tokens_with_ids

P31 = 2_147_483_647
TRIG_MULT = 1_000_003  # shingle combine multiplier (hash-id-safe packing)
NUM_HASHES = 8
BANDS = 4  # rows per band = NUM_HASHES // BANDS = 2
TRIGRAM_JACCARD_PERMILLE = 200
EMB_DUP_PERMILLE = 250  # |cos| >= 0.25


def minhash_coeffs(num_hashes: int = NUM_HASHES) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) for h_j(tid) = (tid*a_j + b_j) mod P31 —
    shared with the SQL oracle."""
    return [(((j + 1) * A1) % P31, (j * 40_503 + 12_345) % P31) for j in range(num_hashes)]


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup: group by content digest; (keeper, cnt) per distinct text.
    keeper = min doc_id (the canonical row a dedup pass would keep).

    Grouping key is sha2(text) — computed map-side so full document bytes
    never cross the shuffle (only 32-byte digests do). SHA-256 collisions
    are cryptographically negligible, so the groups equal group-by-text
    (which is what the SQL oracle runs)."""
    return docs.groupBy(F.sha2(F.col("text"), 256).alias("h")).agg(
        F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("cnt")
    ).select("keeper", "cnt")


def _trigrams(docs: DataFrame) -> DataFrame:
    """Distinct token-trigram shingles per doc, packed by modular combine
    trig = ((t1*K + t2) % P31 * K + t3) % P31 with K=TRIG_MULT — safe for
    the 31-bit hash token ids (tid*K stays < 2^51). (doc_id, trig)."""
    t = tokens_with_ids(docs)
    t1 = t.alias("t1")
    t2 = t.select("doc_id", (F.col("pos") - 1).alias("pos"), F.col("tid").alias("tid2")).alias("t2")
    t3 = t.select("doc_id", (F.col("pos") - 2).alias("pos"), F.col("tid").alias("tid3")).alias("t3")
    trig = (
        (F.col("tid").cast("long") * F.lit(TRIG_MULT) + F.col("tid2")) % F.lit(P31) * F.lit(TRIG_MULT)
        + F.col("tid3")
    ) % F.lit(P31)
    tri = (
        t1.join(t2, ["doc_id", "pos"]).join(t3, ["doc_id", "pos"])
        .select("doc_id", trig.alias("trig"))
        .distinct()
    )
    return tri


NGRAM_DF_CAP = 64  # drop shingles shared by more than this many docs from CANDIDATE generation


def ngram_jaccard_pairs(
    docs: DataFrame, permille: int = TRIGRAM_JACCARD_PERMILLE, df_cap: int = NGRAM_DF_CAP
) -> DataFrame:
    """n-gram (trigram) Jaccard near-dup pairs:
    (doc_a, doc_b, jac_permille) with doc_a < doc_b and
    jac_permille = floor(1000 * |A∩B| / |A∪B|) >= permille.

    Scale shape: candidate pairs come from a self-join on shingles whose
    document frequency is <= df_cap — a hot shingle shared by 10^6 docs
    would otherwise emit 10^12 candidate pairs from one join key. The
    Jaccard itself is then EXACT over the full shingle sets (the |A∩B|
    count joins the full trigram table restricted to candidates, linear in
    |candidates| * avg shingles). Recall trade, documented: a pair is
    missed only if EVERY shingle it shares is hotter than df_cap — such
    pairs are near-duplicates of boilerplate, the standard exclusion
    (MinHash pipelines use the same df cap). At the testdata max df = 7,
    so the cap never binds and the output equals the uncapped join."""
    # eager localCheckpoint, not persist: tri feeds four branches (df,
    # candidates, common, sizes); the checkpointed RDD is released by the
    # ContextCleaner when the result goes out of scope — persist() here
    # leaked cache blocks across the session (round-2 finding)
    tri = _trigrams(docs).localCheckpoint(eager=True)
    df = tri.groupBy("trig").agg(F.count(F.lit(1)).alias("df_"))
    rare = tri.join(df.where(F.col("df_") <= df_cap), "trig").select("doc_id", "trig")
    cand = (
        rare.select(F.col("doc_id").alias("doc_a"), "trig")
        .join(rare.select(F.col("doc_id").alias("doc_b"), "trig"), "trig")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact |A∩B| over FULL shingle sets, restricted to candidate pairs
    ta = tri.select(F.col("doc_id").alias("doc_a"), "trig")
    tb = tri.select(F.col("doc_id").alias("doc_b"), "trig")
    common = (
        cand.join(ta, "doc_a").join(tb, ["doc_b", "trig"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sizes = tri.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    jac = (F.col("common") * 1000 / (F.col("sza") + F.col("szb") - F.col("common"))).cast("long")
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jac_permille"))
        .where(F.col("jac_permille") >= permille)
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, mh0..mh{H-1}) — min over the doc's distinct trigram shingles
    of (trig*a_j + b_j) mod P31."""
    tri = _trigrams(docs)
    aggs = [
        F.min((F.col("trig") * F.lit(a) + F.lit(b)) % F.lit(P31)).alias(f"mh{j}")
        for j, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    return tri.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = NUM_HASHES, bands: int = BANDS) -> DataFrame:
    """LSH candidate pairs: docs whose minhash signatures agree on all rows
    of at least one band. (doc_a, doc_b), doc_a < doc_b, distinct.
    The banded bucket join IS the scale path: one shuffle on (band, sig)."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes)
    bands_df = None
    for bnd in range(bands):
        # pack the band's row values into one int64: mh_i < P31 < 2^31
        expr = F.lit(0).cast("long")
        for r in range(rows):
            expr = expr * F.lit(P31) + F.col(f"mh{bnd * rows + r}")
        part = sig.select("doc_id", F.lit(bnd).alias("band"), expr.alias("sig"))
        bands_df = part if bands_df is None else bands_df.unionByName(part)
    a = bands_df.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = bands_df.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, sim) — bit i of ``sim`` is 1 iff the sum over the doc's
    distinct token-ids of (2*bit_i(h(tid)) - 1) is > 0, with
    h(tid) = (tid*A1 + 12345) mod P31."""
    t = tokens_with_ids(docs).select("doc_id", "tid").distinct()
    h = (F.col("tid") * F.lit(A1) + F.lit(12_345)) % F.lit(P31)
    sums = t.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftrightunsigned(h, i) % 2 * 2 - 1).alias(f"s{i}")
            for i in range(bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim + F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sums.select("doc_id", sim.alias("sim"))


# ---------------------------------------------------------------------------
# embedding near-dup (quantized, exact)
# ---------------------------------------------------------------------------

def quantized_embeddings(emb: DataFrame, scale: int = 1000) -> DataFrame:
    """(vec_id, qv array<long>, norm2 long): fixed-point quantization
    qv_i = floor(double(e_i) * scale) — float32 -> double widening and the
    multiply are IEEE-deterministic, so both engines get identical ints
    (the comparator.h quantization discipline applied to vectors)."""
    qv = F.transform("embedding", lambda x: F.floor(x.cast("double") * scale).cast("long"))
    out = emb.select("vec_id", qv.alias("qv"))
    norm2 = F.aggregate(F.zip_with("qv", "qv", lambda a, b: a * b), F.lit(0).cast("long"), lambda acc, x: acc + x)
    return out.select("vec_id", "qv", norm2.alias("norm2"))


EMB_BLOCK_PLANES = 4  # 2^4 = 16 direction-coherent blocks (floor; auto-scales)
EMB_TILE_ROWS = 8192  # max rows per GEMM tile side (bounds task memory)


def tile_block_pairs(
    bsize: dict[int, int], pair_rows: list[tuple[int, int]], tile_rows: int
) -> list[tuple]:
    """Expand surviving block pairs into bounded GEMM tile pairs.

    T[blk] = ceil(size/tile_rows) tiles per side; tile id = vec_id % T, so
    every tile holds <= ceil(size/T) ~= tile_rows vectors. Self-pair blocks
    emit only ta <= tb (the GEMM's ia != ib filter + min/max output keeps
    per-pair uniqueness). Rows: (blk_a, blk_b, ta, tb, T_a, T_b, pk)."""
    ntiles = {b: max(1, -(-bsize[b] // tile_rows)) for b in bsize}
    rows = []
    for ba, bb in pair_rows:
        for ta in range(ntiles[ba]):
            for tb in range(ta if ba == bb else 0, ntiles[bb]):
                rows.append((ba, bb, ta, tb, ntiles[ba], ntiles[bb], f"{ba}_{bb}_{ta}_{tb}"))
    return rows


def embedding_dup_pairs(
    emb: DataFrame,
    permille: int = EMB_DUP_PERMILLE,
    block_planes: int | None = None,
    tile_rows: int = EMB_TILE_ROWS,
) -> DataFrame:
    """Near-duplicate vector pairs by EXACT integer cosine^2 test:
    (1000*dot)^2 >= permille^2 * na * nb, dot > 0. (vec_a, vec_b, dot).

    Scale shape (replaces the round-1 crossJoin): an exact blocked
    all-pairs similarity join with angular pruning —

      1. vectors are hashed into 2^block_planes direction-coherent blocks
         (hyperplane LSH bucket: similar directions land together);
      2. per block, one aggregation pass yields centroid + angular radius
         (max angle of a member to the centroid) — O(blocks) driver data,
         constant in n;
      3. block PAIRS are pruned by the spherical triangle inequality:
         angle(u, v) >= angle(c_a, c_b) - r_a - r_b for u in a, v in b, so
         a pair of blocks whose best-case cosine (with a float safety
         margin) is below the threshold provably contains no result pair —
         EXACT pruning, unlike LSH candidate generation (the result pairs
         here sit ON the 0.25 threshold, where any hash scheme loses pairs);
      4. surviving block pairs are TILED into (<= tile_rows x <= tile_rows)
         chunk pairs — pk = (blk_a, blk_b, tile_a, tile_b) — so one
         applyInPandas task holds two bounded tiles, never two full blocks
         (round 2 put a whole block pair in ONE task: a 16-task
         parallelism ceiling and OOM at 10^9 vectors); each tile pair
         computes its dot products as one vectorized numpy matmul
         (Arrow-batched), float prescreen + exact integer check.

    Work is Θ(sum over surviving block pairs of n_a*n_b) — quadratic in the
    worst case (a dense 0.25-threshold all-pairs join over DENSE vectors
    has no sub-quadratic exact algorithm) but pruned hard on clustered
    data, balanced into bounded tile tasks, and each vector is shuffled
    once per partner TILE (the data-movement price of bounded memory).
    block_planes auto-scales with table size (more blocks = finer pruning,
    B^2 centroid work stays driver-trivial). The approximate scale path
    with recall dialed by probe count remains similarity.ann_lsh."""
    import math

    import numpy as np
    import pandas as pd

    from .similarity import lsh_bucket_col

    spark = emb.sparkSession
    thr = permille / 1000.0
    base = quantized_embeddings(emb).where(F.col("norm2") > 0).localCheckpoint(eager=True)
    if block_planes is None:
        n_vec = base.count()
        block_planes = min(10, max(EMB_BLOCK_PLANES, int(math.log2(max(n_vec, 1) / 4000 + 1)) + 4))
    q = base.withColumn("blk", lsh_bucket_col("qv", block_planes).cast("int"))

    # --- block summaries: centroid (explode + groupBy: scales) ------------
    cent_pd = (
        q.select("blk", F.posexplode("qv").alias("i", "e"))
        .groupBy("blk", "i")
        .agg(F.sum("e").alias("se"), F.count(F.lit(1)).alias("n"))
        .toPandas()  # <= blocks * dims rows — constant in table size
    )
    blks = sorted(cent_pd.blk.unique())
    dims = int(cent_pd.i.max()) + 1
    C = np.zeros((len(blks), dims))
    bidx = {b: i for i, b in enumerate(blks)}
    for b, i, se, n in cent_pd[["blk", "i", "se", "n"]].itertuples(index=False, name=None):
        C[bidx[b], i] = se / n
    Cn = np.linalg.norm(C, axis=1)

    # --- per-block angular radius: one mapInPandas pass + tiny agg --------
    def _mincos(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["qv"].to_numpy()).astype("float64")
            b = pdf["blk"].to_numpy()
            c = C[np.vectorize(bidx.get)(b)]
            cn = Cn[np.vectorize(bidx.get)(b)]
            vn = np.linalg.norm(V, axis=1)
            denom = vn * cn
            cos = np.where(denom > 0, (V * c).sum(1) / np.maximum(denom, 1e-300), -1.0)
            yield pd.DataFrame({"blk": b, "mc": cos})

    rad_pd = (
        q.select("blk", "qv")
        .mapInPandas(_mincos, schema="blk int, mc double")
        .groupBy("blk")
        .agg(F.min("mc").alias("mc"))
        .toPandas()
    )
    radius = np.full(len(blks), np.pi)
    for b, mc in rad_pd[["blk", "mc"]].itertuples(index=False, name=None):
        radius[bidx[b]] = np.arccos(np.clip(mc, -1.0, 1.0))

    # --- exact block-pair pruning (driver numpy over B^2 — B is tiny) -----
    with np.errstate(invalid="ignore"):
        cc = (C @ C.T) / np.maximum(np.outer(Cn, Cn), 1e-300)
    theta = np.arccos(np.clip(cc, -1.0, 1.0))
    best = np.cos(np.maximum(theta - radius[:, None] - radius[None, :] - 1e-6, 0.0))
    keep = best >= thr - 1e-6  # float safety margin: never prunes a true pair
    pair_rows = [
        (int(blks[i]), int(blks[j]))
        for i in range(len(blks))
        for j in range(i, len(blks))
        if keep[i, j]
    ]
    if not pair_rows:
        return spark.createDataFrame([], schema="vec_a long, vec_b long, dot long")

    # --- tile the surviving block pairs: pk = (blk_a, blk_b, ta, tb) ------
    # block sizes are already on the driver (cent_pd carries n per block)
    bsize = {int(b): int(n) for b, n in cent_pd.groupby("blk")["n"].first().items()}
    tp_rows = tile_block_pairs(bsize, pair_rows, tile_rows)
    tp = spark.createDataFrame(
        pd.DataFrame(tp_rows, columns=["blk_a", "blk_b", "ta", "tb", "na_t", "nb_t", "pk"])
    )

    # --- surviving tile pairs: vectorized GEMM + exact integer check ------
    side_a = (
        q.join(F.broadcast(tp), (q.blk == tp.blk_a) & (q.vec_id % tp.na_t == tp.ta))
        .select("pk", F.lit(0).alias("side"), "vec_id", "qv", "norm2")
    )
    side_b = (
        q.join(F.broadcast(tp), (q.blk == tp.blk_b) & (q.vec_id % tp.nb_t == tp.tb))
        .select("pk", F.lit(1).alias("side"), "vec_id", "qv", "norm2")
    )
    both = side_a.unionByName(side_b)
    t2 = permille * permille

    def _pair_gemm(key, pdf):
        A = pdf[pdf["side"] == 0]
        B = pdf[pdf["side"] == 1]
        if not len(A) or not len(B):
            return pd.DataFrame({"vec_a": [], "vec_b": [], "dot": []}).astype("int64")
        Va = np.stack(A["qv"].to_numpy()).astype("int64")
        Vb = np.stack(B["qv"].to_numpy()).astype("int64")
        ia, ib = A["vec_id"].to_numpy(), B["vec_id"].to_numpy()
        na, nb = A["norm2"].to_numpy(), B["norm2"].to_numpy()
        D = Va @ Vb.T  # |e| <= ~16e3, d=64 -> |dot| < 2^45: int64-safe
        # ia != ib (not <): in a cross-block group each vector sits on ONE
        # side, so the smaller id may be on either side; output (min, max)
        ii, jj = np.nonzero((D > 0) & (ia[:, None] != ib[None, :]))
        if not len(ii):
            return pd.DataFrame({"vec_a": [], "vec_b": [], "dot": []}).astype("int64")
        d0 = D[ii, jj]
        # float prescreen with margin (float factors first: int64 t2*na*nb
        # would overflow), exact object-int check on survivors
        pre = d0.astype("float64") ** 2 * 1e6 >= (
            na[ii].astype("float64") * nb[jj].astype("float64") * t2
        ) * (1 - 1e-9)
        ii, jj, d0 = ii[pre], jj[pre], d0[pre]
        ok = np.fromiter(
            (int(d) * int(d) * 1_000_000 >= t2 * int(x) * int(y) for d, x, y in zip(d0, na[ii], nb[jj])),
            dtype=bool, count=len(d0),
        )
        va, vb = ia[ii[ok]], ib[jj[ok]]
        return pd.DataFrame(
            {"vec_a": np.minimum(va, vb), "vec_b": np.maximum(va, vb), "dot": d0[ok]}
        ).astype("int64")

    out = (
        both.groupBy("pk")
        .applyInPandas(_pair_gemm, schema="vec_a long, vec_b long, dot long")
        .dropDuplicates(["vec_a", "vec_b"])  # self-pair blocks emit each pair once; cross pairs are unique
    )
    return out
