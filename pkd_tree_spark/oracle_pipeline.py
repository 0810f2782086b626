"""DuckDB oracle SQL for the training-data pipeline operators
(pkd_tree_spark.pipeline.*) — same deterministic formulas, pure SQL over
the pre-registered ``documents`` / ``embeddings`` / ``lineitem`` views.
Constants are imported from the engine modules: one source of truth.
"""

from __future__ import annotations

from . import config as C
from . import fixtures as FX
from .pipeline import dedup as DD
from .pipeline import text as TX

P = TX.P31

# shared token CTEs -----------------------------------------------------------
TOKS = (
    "toks AS (SELECT doc_id, unnest(parts) AS tok, generate_subscripts(parts, 1) AS pos "
    "FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents))"
)
# token id = polynomial char-fold hash mod P31, bit-identical to
# pipeline.text.tok_id_col (list_reduce's first-element init == Spark's
# aggregate with init 0, since 0*131 + c1 = c1)
_TID_EXPR = (
    f"list_reduce(list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT)), "
    f"(acc, x) -> (acc * {TX.TOK_HASH_MULT} + x) % {P})"
)
TOKID = f"tokid AS (SELECT doc_id, pos, {_TID_EXPR} AS tid FROM toks)"
_BASE = f"WITH {TOKS}, {TOKID}"


def token_stats_sql() -> str:
    return (
        f"WITH {TOKS}, agg AS ("
        f"  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        f"         CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct, "
        f"         CAST(sum(length(tok)) AS BIGINT) AS tok_chars FROM toks GROUP BY doc_id) "
        f"SELECT d.doc_id AS doc_id, n_tokens, CAST(length(d.text) AS BIGINT) AS n_chars, n_distinct, "
        f"       CAST(n_distinct * 1000 // n_tokens AS BIGINT) AS distinct_permille, "
        f"       CAST(tok_chars * 100 // n_tokens AS BIGINT) AS avg_len_x100 "
        f"FROM documents d JOIN agg USING (doc_id)"
    )


def lang_id_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in TX.STOPWORDS)
    return (
        f"WITH {TOKS}, agg AS ("
        f"  SELECT doc_id, count(*) AS n, sum(CASE WHEN tok IN ({stop}) THEN 1 ELSE 0 END) AS stop "
        f"  FROM toks GROUP BY doc_id) "
        f"SELECT doc_id, CAST(stop * 1000 // n AS BIGINT) AS stop_permille, "
        f"       CASE WHEN stop * 1000 // n >= {TX.LANG_PERMILLE} THEN 'en' ELSE 'unk' END AS pred_lang "
        f"FROM agg"
    )


def fingerprint_sql() -> str:
    return (
        f"{_BASE} "
        f"SELECT doc_id, CAST(sum(((tid + 1) * ((pos * {C.A2}) % {P})) % {P}) % {P} AS BIGINT) AS fp "
        f"FROM tokid GROUP BY doc_id"
    )


def exact_dup_sql() -> str:
    return "SELECT min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY text"


TRIGRAMS = (
    f"tri AS (SELECT DISTINCT t1.doc_id, "
    f"((t1.tid * {DD.TRIG_MULT} + t2.tid) % {P} * {DD.TRIG_MULT} + t3.tid) % {P} AS trig "
    f"FROM tokid t1 JOIN tokid t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1 "
    f"JOIN tokid t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2)"
)


def ngram_jaccard_sql(
    permille: int = DD.TRIGRAM_JACCARD_PERMILLE, df_cap: int = DD.NGRAM_DF_CAP
) -> str:
    # mirrors dedup.ngram_jaccard_pairs: DF-capped candidate generation,
    # exact Jaccard over full shingle sets for candidate pairs
    return (
        f"{_BASE}, {TRIGRAMS}, "
        f"df AS (SELECT trig, count(*) AS c FROM tri GROUP BY trig), "
        f"rare AS (SELECT tri.doc_id, tri.trig FROM tri JOIN df USING (trig) WHERE df.c <= {df_cap}), "
        f"cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        f"  FROM rare a JOIN rare b ON a.trig = b.trig AND a.doc_id < b.doc_id), "
        f"common AS (SELECT c.doc_a, c.doc_b, count(*) AS common FROM cand c "
        f"  JOIN tri a ON a.doc_id = c.doc_a JOIN tri b ON b.doc_id = c.doc_b AND b.trig = a.trig "
        f"  GROUP BY 1, 2), "
        f"sizes AS (SELECT doc_id, count(*) AS sz FROM tri GROUP BY doc_id) "
        f"SELECT doc_a, doc_b, CAST(common * 1000 // (sa.sz + sb.sz - common) AS BIGINT) AS jac_permille "
        f"FROM common JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
        f"WHERE common * 1000 // (sa.sz + sb.sz - common) >= {permille}"
    )


def minhash_lsh_sql(num_hashes: int = DD.NUM_HASHES, bands: int = DD.BANDS) -> str:
    rows = num_hashes // bands
    coeffs = DD.minhash_coeffs(num_hashes)
    mh_cols = ", ".join(
        f"CAST(min((trig * {a} + {b}) % {P}) AS BIGINT) AS mh{j}" for j, (a, b) in enumerate(coeffs)
    )
    band_selects = []
    for bnd in range(bands):
        expr = "CAST(0 AS BIGINT)"
        for r in range(rows):
            expr = f"({expr} * {P} + mh{bnd * rows + r})"
        band_selects.append(f"SELECT doc_id, {bnd} AS band, {expr} AS sig FROM sig")
    bands_sql = " UNION ALL ".join(band_selects)
    return (
        f"{_BASE}, {TRIGRAMS}, "
        f"sig AS (SELECT doc_id, {mh_cols} FROM tri GROUP BY doc_id), "
        f"bandtab AS ({bands_sql}) "
        f"SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        f"FROM bandtab a JOIN bandtab b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id"
    )


def simhash_sql(bits: int = 16) -> str:
    h = f"((tid * {C.A1} + 12345) % {P})"
    sums = ", ".join(
        f"sum((({h} // {1 << i}) % 2) * 2 - 1) AS s{i}" for i in range(bits)
    )
    sim = " + ".join(f"CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(bits))
    return (
        f"{_BASE}, dt AS (SELECT DISTINCT doc_id, tid FROM tokid), "
        f"sums AS (SELECT doc_id, {sums} FROM dt GROUP BY doc_id) "
        f"SELECT doc_id, CAST({sim} AS BIGINT) AS sim FROM sums"
    )


# embeddings ------------------------------------------------------------------
QVD = (
    "qvd AS (SELECT vec_id, unnest(qv) AS e, generate_subscripts(qv, 1) AS i "
    "FROM (SELECT vec_id, list_transform(embedding, "
    "x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv FROM embeddings))"
)


def topk_dot_sql(n_queries: int = 16, k: int = 10) -> str:
    return (
        f"WITH {QVD}, "
        f"dots AS (SELECT q.vec_id AS qid, v.vec_id AS vec_id, CAST(sum(q.e * v.e) AS BIGINT) AS dot "
        f"  FROM qvd q JOIN qvd v ON q.i = v.i AND q.vec_id < {n_queries} AND v.vec_id <> q.vec_id "
        f"  GROUP BY 1, 2) "
        f"SELECT qid, rn, vec_id, dot FROM ("
        f"  SELECT qid, vec_id, dot, CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) AS BIGINT) AS rn "
        f"  FROM dots) WHERE rn <= {k}"
    )


def embedding_dup_sql(permille: int = DD.EMB_DUP_PERMILLE) -> str:
    return (
        f"WITH {QVD}, "
        f"norms AS (SELECT vec_id, CAST(sum(e * e) AS BIGINT) AS n2 FROM qvd GROUP BY vec_id), "
        f"dots AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, CAST(sum(a.e * b.e) AS BIGINT) AS dot "
        f"  FROM qvd a JOIN qvd b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2) "
        f"SELECT vec_a, vec_b, dot FROM dots JOIN norms na ON na.vec_id = vec_a JOIN norms nb ON nb.vec_id = vec_b "
        f"WHERE dot > 0 AND CAST(dot AS HUGEINT) * dot * 1000000 >= "
        f"CAST({permille * permille} AS HUGEINT) * na.n2 * nb.n2"
    )


# multimodal (over the synthesized spans documents from lineitem keys) --------

def media_decode_sql() -> str:
    """Media spans of the synth documents: positions p with p != geo slot and
    (k+p) odd; handle h = (k*A3 + p) % 2^48; fake-decode arithmetic."""
    k = "l_orderkey * 10 + l_linenumber"
    return (
        f"WITH keys AS (SELECT CAST({k} AS BIGINT) AS k FROM lineitem), "
        f"m AS (SELECT k, i AS pos FROM keys JOIN range(0, 4) t(i) "
        f"  ON i < 1 + k % 4 AND i <> k % (1 + k % 4) AND (k + i) % 2 = 1), "
        f"h AS (SELECT k, pos, (k * {C.A3} + pos) % {1 << 48} AS h FROM m) "
        f"SELECT 'doc_' || lpad(CAST(k AS VARCHAR), 12, '0') AS doc_id, "
        f"       CAST(pos AS INT) AS span_idx, "
        f"       'media://' || lpad(upper(to_hex(h)), 16, '0') AS media_ref, "
        f"       CAST(96 AS BIGINT) AS n_bytes, "
        f"       CAST(320 + h % 1600 AS BIGINT) AS width, "
        f"       CAST(240 + (h // 7) % 900 AS BIGINT) AS height, "
        f"       CAST(1 + h % 240 AS BIGINT) AS n_frames "
        f"FROM h"
    )
