"""DuckDB oracle SQL generators.

Every spatial operator in __spark_entry__.queries() has a matching SQL
string here that recomputes the SAME deterministic points / query fixtures
by int64 arithmetic over the pre-registered testdata views (lineitem,
orders, ...) and answers the query relationally — the differential-testing
role CGAL plays for the reference (tests/checkCorrectParallel.cpp).

The SQL never sees the engine's spans table, Morton keys, covers, or
metadata: it re-derives coordinates straight from lineitem keys. Agreement
therefore checks the whole pipeline (span synthesis -> extraction ->
encode -> partition -> metadata/boundary plan) end to end.
"""

from __future__ import annotations

from . import config as C
from . import fixtures as FX

M = C.COORD_BOUND
_MULTS = C.COORD_MULTS
_ADDS = C.COORD_ADDS


def _coord_sql(kexpr: str, j: int, dist: str) -> str:
    uni = f"(({kexpr}) * {_MULTS[j]} + {_ADDS[j]}) % {M}"
    if dist == "uniform":
        return uni
    cm = C.VARDEN_CENTER_MULT + j * 1_000_003
    c = f"(({kexpr}) % {C.VARDEN_CLUSTERS})"
    sigma = f"({C.VARDEN_SIGMA_BASE} + ({c} * {c} * {C.VARDEN_SIGMA_MULT}) % {C.VARDEN_SIGMA_MOD})"
    center = f"((({c} + 1) * {cm}) % {M})"
    off = f"((({kexpr}) * {_MULTS[j]} + {_ADDS[j]}) % (2 * {sigma} + 1) - {sigma})"
    clustered = f"least(greatest({center} + {off}, 0), {M - 1})"
    return f"(CASE WHEN ({kexpr}) % 100 = 0 THEN {uni} ELSE {clustered} END)"


def pts_cte(dist: str = "uniform", d: int = 2, source: str = "lineitem") -> str:
    """Base points from lineitem keys (k = l_orderkey*10 + l_linenumber)."""
    k = "l_orderkey * 10 + l_linenumber"
    coords = ", ".join(f"CAST({_coord_sql('k', j, dist)} AS BIGINT) AS x{j}" for j in range(d))
    return (
        f"keys AS (SELECT CAST({k} AS BIGINT) AS k FROM {source}), "
        f"pts AS (SELECT k AS key, k % (1 + k % 4) AS span_idx, {coords} FROM keys)"
    )


def insert_pts_cte(dist: str = "uniform", d: int = 2) -> str:
    """Insert batch: fresh keys 10_000_000 + o_orderkey from orders."""
    coords = ", ".join(f"CAST({_coord_sql('k', j, dist)} AS BIGINT) AS x{j}" for j in range(d))
    return (
        f"ikeys AS (SELECT CAST({FX.INSERT_KEY_OFFSET} + o_orderkey AS BIGINT) AS k FROM orders), "
        f"ipts AS (SELECT k AS key, k % (1 + k % 4) AS span_idx, {coords} FROM ikeys)"
    )


def box_cte(nq: int, d: int = 2, hw_base: int | None = None) -> str:
    base = FX.BOX_HW_BASE if hw_base is None else hw_base
    hw = f"({base} + (i * {C.A3} + {FX.BOX_HW_OFF}) % {FX.BOX_HW_MOD})"
    cols = []
    for j in range(d):
        c = f"((i * {_MULTS[j]} + {FX.BOX_CENTER_OFF[j]}) % {M})"
        cols.append(f"greatest(0, {c} - {hw}) AS lo{j}")
        cols.append(f"least({M - 1}, {c} + {hw}) AS hi{j}")
    return f"q AS (SELECT i AS qid, {', '.join(cols)} FROM range(0, {nq}) t(i))"


def ball_cte(nq: int, d: int = 2) -> str:
    r = f"({FX.BALL_R_BASE} + (i * {C.A1} + {FX.BALL_R_OFF}) % {FX.BALL_R_MOD})"
    cols = [f"((i * {_MULTS[j]} + {FX.BALL_CENTER_OFF[j]}) % {M}) AS c{j}" for j in range(d)]
    cols.append(f"{r} * {r} AS r2")
    return f"q AS (SELECT i AS qid, {', '.join(cols)} FROM range(0, {nq}) t(i))"


def knn_q_cte(nq: int, d: int = 2) -> str:
    cols = [f"((i * {_MULTS[j]} + {FX.KNN_Q_OFF[j]}) % {M}) AS q{j}" for j in range(d)]
    return f"q AS (SELECT i AS qid, {', '.join(cols)} FROM range(0, {nq}) t(i))"


def diamond_cte(nq: int) -> str:
    return (
        f"q AS (SELECT i AS qid, "
        f"((i * {C.A1} + {FX.DIAMOND_C_OFF[0]}) % {M}) AS c0, "
        f"((i * {C.A2} + {FX.DIAMOND_C_OFF[1]}) % {M}) AS c1, "
        f"({FX.DIAMOND_R_BASE} + (i * {C.A3} + {FX.DIAMOND_R_OFF}) % {FX.DIAMOND_R_MOD}) AS r "
        f"FROM range(0, {nq}) t(i))"
    )


def _box_pred(d: int) -> str:
    return " AND ".join(f"p.x{j} BETWEEN q.lo{j} AND q.hi{j}" for j in range(d))


def _ball_pred(d: int) -> str:
    dist2 = " + ".join(f"(p.x{j} - q.c{j}) * (p.x{j} - q.c{j})" for j in range(d))
    return f"({dist2}) <= q.r2"


def _count_sql(qcte: str, pred: str, dist: str, d: int, pts: str = "pts") -> str:
    extra = ""
    if pts == "allpts":
        extra = ", " + insert_pts_cte(dist, d) + ", allpts AS (SELECT * FROM pts UNION ALL SELECT * FROM ipts)"
    return (
        f"WITH {pts_cte(dist, d)}{extra}, {qcte} "
        f"SELECT q.qid AS qid, CAST(count(p.key) AS BIGINT) AS cnt "
        f"FROM q LEFT JOIN {pts} p ON {pred} GROUP BY q.qid"
    )


def range_count_box_sql(nq: int, d: int = 2, dist: str = "uniform", hw_base: int | None = None) -> str:
    return _count_sql(box_cte(nq, d, hw_base), _box_pred(d), dist, d)


def range_count_ball_sql(nq: int, d: int = 2, dist: str = "uniform") -> str:
    return _count_sql(ball_cte(nq, d), _ball_pred(d), dist, d)


def range_count_diamond_sql(nq: int, dist: str = "uniform") -> str:
    pred = "abs(p.x0 - q.c0) + abs(p.x1 - q.c1) <= q.r"
    return _count_sql(diamond_cte(nq), pred, dist, 2)


def range_report_box_sql(nq: int, d: int = 2, dist: str = "uniform") -> str:
    cols = ", ".join(f"p.x{j} AS x{j}" for j in range(d))
    return (
        f"WITH {pts_cte(dist, d)}, {box_cte(nq, d)} "
        f"SELECT q.qid AS qid, 'doc_' || lpad(CAST(p.key AS VARCHAR), 12, '0') AS doc_id, "
        f"CAST(p.span_idx AS INT) AS span_idx, p.key AS key, {cols} "
        f"FROM q JOIN pts p ON {_box_pred(d)}"
    )


def range_report_ball_sql(nq: int, d: int = 2, dist: str = "uniform") -> str:
    cols = ", ".join(f"p.x{j} AS x{j}" for j in range(d))
    return (
        f"WITH {pts_cte(dist, d)}, {ball_cte(nq, d)} "
        f"SELECT q.qid AS qid, 'doc_' || lpad(CAST(p.key AS VARCHAR), 12, '0') AS doc_id, "
        f"CAST(p.span_idx AS INT) AS span_idx, p.key AS key, {cols} "
        f"FROM q JOIN pts p ON {_ball_pred(d)}"
    )


def knn_q_cte_varden(nq: int, d: int = 2) -> str:
    """OOD queries (Q5): the varden formula on the query id (mirrors
    fixtures.knn_fixtures_varden exactly)."""
    cols = [f"CAST({_coord_sql('i', j, 'varden')} AS BIGINT) AS q{j}" for j in range(d)]
    return f"q AS (SELECT i AS qid, {', '.join(cols)} FROM range(0, {nq}) t(i))"


def dup_pts_cte(dist: str = "uniform", d: int = 2, sites: int = 20, mult: int = 52_631) -> str:
    """Duplicate-heavy lattice (dummy-leaf regime, build_tree.hpp:183-186):
    coords collapsed onto sites^d lattice points."""
    cols = ", ".join(f"CAST(x{j} % {sites} * {mult} AS BIGINT) AS x{j}" for j in range(d))
    return f"{pts_cte(dist, d)}, dpts AS (SELECT key, span_idx, {cols} FROM pts)"


def knn_sql(
    nq: int, k: int, d: int = 2, dist: str = "uniform", state: str = "base", qdist: str = "uniform"
) -> str:
    """state: 'base' | 'inserted' (base + insert batch) | 'updated'
    (base + insert, minus keys k%DELETE_MOD==0). qdist='varden' draws the
    QUERIES from the cluster distribution (OOD, Q5)."""
    dist2 = " + ".join(f"(p.x{j} - q.q{j}) * (p.x{j} - q.q{j})" for j in range(d))
    src = "pts"
    extra = ""
    if state in ("inserted", "updated"):
        extra = ", " + insert_pts_cte(dist, d) + ", allpts AS (SELECT * FROM pts UNION ALL SELECT * FROM ipts)"
        src = "allpts"
    if state == "updated":
        extra += f", livepts AS (SELECT * FROM allpts WHERE key % {FX.DELETE_MOD} <> 0)"
        src = "livepts"
    qcte = knn_q_cte(nq, d) if qdist == "uniform" else knn_q_cte_varden(nq, d)
    return (
        f"WITH {pts_cte(dist, d)}{extra}, {qcte} "
        f"SELECT qid, rn, key, dist2 FROM ("
        f"  SELECT qid, key, dist2, row_number() OVER (PARTITION BY qid ORDER BY dist2, key, span_idx) AS rn "
        f"  FROM (SELECT q.qid AS qid, p.key AS key, CAST({dist2} AS BIGINT) AS dist2, p.span_idx AS span_idx "
        f"        FROM q CROSS JOIN {src} p) raw) ranked "
        f"WHERE rn <= {k}"
    )


def knn_dup_sql(nq: int, k: int, d: int = 2, dist: str = "uniform", sites: int = 20, mult: int = 52_631) -> str:
    """kNN over the duplicate-heavy lattice (multiset semantics: duplicate
    points count as distinct neighbors, tie-broken by key, span_idx)."""
    dist2 = " + ".join(f"(p.x{j} - q.q{j}) * (p.x{j} - q.q{j})" for j in range(d))
    return (
        f"WITH {dup_pts_cte(dist, d, sites, mult)}, {knn_q_cte(nq, d)} "
        f"SELECT qid, rn, key, dist2 FROM ("
        f"  SELECT qid, key, dist2, row_number() OVER (PARTITION BY qid ORDER BY dist2, key, span_idx) AS rn "
        f"  FROM (SELECT q.qid AS qid, p.key AS key, CAST({dist2} AS BIGINT) AS dist2, p.span_idx AS span_idx "
        f"        FROM q CROSS JOIN dpts p) raw) ranked "
        f"WHERE rn <= {k}"
    )


def range_report_diamond_sql(nq: int, dist: str = "uniform") -> str:
    """Polygon (diamond) range report: rows inside each convex polygon."""
    return (
        f"WITH {pts_cte(dist, 2)}, {diamond_cte(nq)} "
        f"SELECT q.qid AS qid, 'doc_' || lpad(CAST(p.key AS VARCHAR), 12, '0') AS doc_id, "
        f"CAST(p.span_idx AS INT) AS span_idx, p.key AS key, p.x0 AS x0, p.x1 AS x1 "
        f"FROM q JOIN pts p ON abs(p.x0 - q.c0) + abs(p.x1 - q.c1) <= q.r"
    )


def knn_graph_sql(k: int, d: int = 2, dist: str = "uniform", mod: int = 100, val: int = 3) -> str:
    """kNN-graph oracle: queries = the distinct key-sample of the points
    themselves (self included at dist 0, as in the engine)."""
    dist2 = " + ".join(f"(p.x{j} - q.q{j}) * (p.x{j} - q.q{j})" for j in range(d))
    qcols = ", ".join(f"x{j} AS q{j}" for j in range(d))
    return (
        f"WITH {pts_cte(dist, d)}, "
        f"q AS (SELECT DISTINCT key AS qid, {qcols} FROM pts WHERE key % {mod} = {val}) "
        f"SELECT qid, rn, dst, dist2 FROM ("
        f"  SELECT qid, dst, dist2, row_number() OVER (PARTITION BY qid ORDER BY dist2, dst, span_idx) AS rn "
        f"  FROM (SELECT q.qid AS qid, p.key AS dst, CAST({dist2} AS BIGINT) AS dist2, p.span_idx AS span_idx "
        f"        FROM q CROSS JOIN pts p) raw) ranked "
        f"WHERE rn <= {k}"
    )


def cells_sql(level: int, d: int = 2, dist: str = "uniform") -> str:
    """Per-grid-cell counts at `level` (axis-aligned grid coords, not Morton
    — bit interleaving is checked by the numpy unit tests instead)."""
    w = 1 << (C.GRID_BITS - level)
    gcols = ", ".join(f"CAST(x{j} // {w} AS BIGINT) AS g{j}" for j in range(d))
    gnames = ", ".join(f"g{j}" for j in range(d))
    return (
        f"WITH {pts_cte(dist, d)} "
        f"SELECT {gnames}, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT {gcols} FROM pts) GROUP BY {gnames}"
    )


def raster_to_vector_sql(level: int, threshold: int, d: int = 2, dist: str = "uniform") -> str:
    w = 1 << (C.GRID_BITS - level)
    gcols = ", ".join(f"CAST(x{j} // {w} AS BIGINT) AS g{j}" for j in range(d))
    gnames = ", ".join(f"g{j}" for j in range(d))
    sel = (
        [f"g{j}" for j in range(d)]
        + [f"CAST(g{j} * {w} AS BIGINT) AS lo{j}" for j in range(d)]
        + [f"CAST(g{j} * {w} + {w - 1} AS BIGINT) AS hi{j}" for j in range(d)]
        + ["val"]
    )
    return (
        f"WITH {pts_cte(dist, d)}, "
        f"raster AS (SELECT {gnames}, CAST(count(*) AS BIGINT) AS val "
        f"  FROM (SELECT {gcols} FROM pts) GROUP BY {gnames}) "
        f"SELECT {', '.join(sel)} FROM raster WHERE val >= {threshold}"
    )


def vector_to_raster_sql(nq: int, level: int) -> str:
    """Burn diamond polygons into the level grid: a cell is set iff its
    center (doubled coords) is inside — |cx2 - 2*c0| + |cy2 - 2*c1| <= 2*r."""
    w = 1 << (C.GRID_BITS - level)
    n = 1 << level
    return (
        f"WITH {diamond_cte(nq)}, "
        f"grid AS (SELECT a.i AS g0, b.i AS g1 FROM range(0, {n}) a(i), range(0, {n}) b(i)) "
        f"SELECT qid, g0, g1 FROM q, grid "
        f"WHERE abs(g0 * {w} * 2 + {w - 1} - 2 * c0) + abs(g1 * {w} * 2 + {w - 1} - 2 * c1) <= 2 * r"
    )


def tile_assignments_sql(level: int, d: int = 2, dist: str = "uniform") -> str:
    w = 1 << (C.GRID_BITS - level)
    gcols = ", ".join(f"CAST(x{j} // {w} AS BIGINT) AS g{j}" for j in range(d))
    return (
        f"WITH {pts_cte(dist, d)} "
        f"SELECT 'doc_' || lpad(CAST(key AS VARCHAR), 12, '0') AS doc_id, "
        f"CAST(span_idx AS INT) AS span_idx, {gcols} FROM pts"
    )


def sliding_window_cells_sql(level: int, window_len: int, d: int = 2, dist: str = "uniform") -> str:
    """After inserting periods 0..P-1 (period = key % P) and expiring all but
    the last `window_len`, the live set is period >= P - window_len."""
    P = FX.SLIDING_PERIODS
    w = 1 << (C.GRID_BITS - level)
    gcols = ", ".join(f"CAST(x{j} // {w} AS BIGINT) AS g{j}" for j in range(d))
    gnames = ", ".join(f"g{j}" for j in range(d))
    return (
        f"WITH {pts_cte(dist, d)} "
        f"SELECT {gnames}, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM (SELECT {gcols} FROM pts WHERE key % {P} >= {P - window_len}) GROUP BY {gnames}"
    )


def sliding_window_time_cells_sql(level: int, window_len: int, d: int = 2) -> str:
    """Time-column sliding window (S6 analog): points from orders keys with
    period = year(o_orderdate); after the replay, the live set is the last
    `window_len` DISTINCT periods present in the data."""
    w = 1 << (C.GRID_BITS - level)
    coords = ", ".join(f"CAST({_coord_sql('k', j, 'uniform')} AS BIGINT) AS x{j}" for j in range(d))
    gcols = ", ".join(f"CAST(x{j} // {w} AS BIGINT) AS g{j}" for j in range(d))
    gnames = ", ".join(f"g{j}" for j in range(d))
    return (
        f"WITH okeys AS (SELECT CAST(o_orderkey AS BIGINT) AS k, year(o_orderdate) AS period FROM orders), "
        f"live AS (SELECT DISTINCT period FROM okeys ORDER BY period DESC LIMIT {window_len}), "
        f"pts AS (SELECT k, {coords} FROM okeys WHERE period IN (SELECT period FROM live)) "
        f"SELECT {gnames}, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM (SELECT {gcols} FROM pts) GROUP BY {gnames}"
    )


def range_count_box_corner_deleted_sql(nq: int, d: int = 2, dist: str = "uniform", corner: int = 131_072) -> str:
    """Range count after deleting every point in the corner box
    [0, corner)^d — the oracle for the copy-on-write delete roundtrip
    (the corner box is exactly pbucket 0 at bucket_level=3 with
    grid_bits=20: top 3 bits of every grid coordinate zero)."""
    pred = _box_pred(d)
    corner_pred = " AND ".join(f"x{j} < {corner}" for j in range(d))
    return (
        f"WITH {pts_cte(dist, d)}, livepts AS (SELECT * FROM pts WHERE NOT ({corner_pred})), {box_cte(nq, d)} "
        f"SELECT q.qid AS qid, CAST(count(p.key) AS BIGINT) AS cnt "
        f"FROM q LEFT JOIN livepts p ON {pred} GROUP BY q.qid"
    )


def range_count_box_updated_sql(nq: int, d: int = 2, dist: str = "uniform", state: str = "inserted") -> str:
    """Range count after MERGE insert (and optional delete of k%7==0)."""
    pred = _box_pred(d)
    extra = ", " + insert_pts_cte(dist, d) + ", allpts AS (SELECT * FROM pts UNION ALL SELECT * FROM ipts)"
    src = "allpts"
    if state == "updated":
        extra += f", livepts AS (SELECT * FROM allpts WHERE key % {FX.DELETE_MOD} <> 0)"
        src = "livepts"
    return (
        f"WITH {pts_cte(dist, d)}{extra}, {box_cte(nq, d)} "
        f"SELECT q.qid AS qid, CAST(count(p.key) AS BIGINT) AS cnt "
        f"FROM q LEFT JOIN {src} p ON {pred} GROUP BY q.qid"
    )
