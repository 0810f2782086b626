"""Deterministic query/update fixtures, derived by pure int64 arithmetic so
the DuckDB oracle (oracle.py) can regenerate them exactly in SQL.

Mirrors the reference's fixture machinery:
  - box/ball query generators (tests/testFramework.h:54-149, 539-571)
  - batch query ratio / OOD variants (tests/test.cpp:89, 494-509)
  - insert/delete batches (tests/test.cpp:53-74)
Selectivity brackets vary with qid through the half-width/radius formulas
(from ~selective to ~type-2 "large" boxes).

Any change to a formula here MUST be mirrored in oracle.py; the pytest
``tests/test_oracle_consistency.py`` cross-checks the two.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import config as C

M = C.COORD_BOUND
_MULTS = C.COORD_MULTS

# formula offsets (also used by oracle.py); dims 7..15 extend by formula
BOX_CENTER_OFF = (1009, 2003, 3001, 4007, 5009, 6011, 7013) + tuple(
    1009 + 997 * j for j in range(7, 16)
)
BOX_HW_BASE, BOX_HW_OFF, BOX_HW_MOD = 2000, 7, 150_000
BALL_CENTER_OFF = (4001, 5003, 6007, 7001, 8011, 9013, 10007)
BALL_R_BASE, BALL_R_OFF, BALL_R_MOD = 1000, 3, 120_000
# dims 7..15 extend by formula (primes-ish odd offsets), mirroring
# config.COORD_MULTS — oracle.knn_q_cte reads this same tuple
KNN_Q_OFF = (7, 11, 13, 17, 19, 23, 29) + tuple(31 + 6 * j for j in range(7, 16))
DIAMOND_C_OFF = (8009, 9001)
DIAMOND_R_BASE, DIAMOND_R_OFF, DIAMOND_R_MOD = 5000, 17, 120_000
INSERT_KEY_OFFSET = 10_000_000
DELETE_MOD = 7
SLIDING_PERIODS = 10


def box_fixtures(nq: int, d: int = 2, hw_base: int | None = None) -> pd.DataFrame:
    """hw_base widens boxes for high d (selectivity ~ (2hw/M)^d: the default
    base gives ~0 expected matches past d~7, so d=16 passes 300_000)."""
    qid = np.arange(nq, dtype=np.int64)
    hw = (BOX_HW_BASE if hw_base is None else hw_base) + (qid * C.A3 + BOX_HW_OFF) % BOX_HW_MOD
    cols = {"qid": qid}
    for j in range(d):
        c = (qid * _MULTS[j] + BOX_CENTER_OFF[j]) % M
        cols[f"lo{j}"] = np.maximum(0, c - hw)
        cols[f"hi{j}"] = np.minimum(M - 1, c + hw)
    return pd.DataFrame(cols)


def box_fixtures_bracketed(nq: int, d: int, n_points: int, btype: int) -> pd.DataFrame:
    """Selectivity-bracketed boxes mirroring the reference's query-type
    classes (tests/testFramework.h:114-131): expected result count m in
      type 0: [1, n^(1/4))     type 1: [n^(1/4), n^(1/2))
      type 2: [n^(1/2), n/100]
    Targets are log-spaced across the bracket per qid; half-width =
    (M/2) * (m/n)^(1/d) under uniformity. Bench-only fixture (the
    correctness gate uses the mixed-selectivity box_fixtures)."""
    qid = np.arange(nq, dtype=np.int64)
    n = max(n_points, 16)
    lo_hi = {
        0: (1.0, n ** 0.25),
        1: (n ** 0.25, n ** 0.5),
        2: (n ** 0.5, n / 100.0),
    }[btype]
    m_lo, m_hi = max(lo_hi[0], 1.0), max(lo_hi[1], 2.0)
    frac = (qid % 97) / 97.0  # deterministic spread across the bracket
    m = m_lo * (m_hi / m_lo) ** frac
    hw = np.maximum(1, ((M / 2.0) * (m / n) ** (1.0 / d)).astype(np.int64))
    cols = {"qid": qid}
    for j in range(d):
        c = (qid * _MULTS[j] + BOX_CENTER_OFF[j]) % M
        cols[f"lo{j}"] = np.maximum(0, c - hw)
        cols[f"hi{j}"] = np.minimum(M - 1, c + hw)
    return pd.DataFrame(cols)


def ball_fixtures(nq: int, d: int = 2) -> pd.DataFrame:
    qid = np.arange(nq, dtype=np.int64)
    r = BALL_R_BASE + (qid * C.A1 + BALL_R_OFF) % BALL_R_MOD
    cols = {"qid": qid}
    for j in range(d):
        cols[f"c{j}"] = (qid * _MULTS[j] + BALL_CENTER_OFF[j]) % M
    cols["r2"] = r * r
    return pd.DataFrame(cols)


def knn_fixtures(nq: int, d: int = 2) -> pd.DataFrame:
    qid = np.arange(nq, dtype=np.int64)
    cols = {"qid": qid}
    for j in range(d):
        cols[f"q{j}"] = (qid * _MULTS[j] + KNN_Q_OFF[j]) % M
    return pd.DataFrame(cols)


def knn_fixtures_varden(nq: int, d: int = 2) -> pd.DataFrame:
    """OOD query set (Q5, tests/test.cpp:494-509): queries drawn from the
    VARDEN cluster distribution — numpy twin of documents.varden_coord_col
    with k = qid (mirrored in SQL by oracle._coord_sql(i, j, 'varden'))."""
    qid = np.arange(nq, dtype=np.int64)
    _ADDS = (C.B1, C.B2, C.B3, C.B4, C.B5, C.B6, C.B7)
    cols = {"qid": qid}
    c = qid % C.VARDEN_CLUSTERS
    sigma = C.VARDEN_SIGMA_BASE + (c * c * C.VARDEN_SIGMA_MULT) % C.VARDEN_SIGMA_MOD
    for j in range(d):
        center = ((c + 1) * (C.VARDEN_CENTER_MULT + j * 1_000_003)) % M
        off = (qid * _MULTS[j] + _ADDS[j]) % (2 * sigma + 1) - sigma
        clustered = np.clip(center + off, 0, M - 1)
        uni = (qid * _MULTS[j] + _ADDS[j]) % M
        cols[f"q{j}"] = np.where(qid % 100 == 0, uni, clustered)
    return pd.DataFrame(cols)


def diamond_fixtures(nq: int) -> pd.DataFrame:
    """Rotated-square (L1-ball) convex polygons, CCW, d=2. Exercises the
    generic convex-polygon path while staying oracle-expressible as
    |x-c0| + |y-c1| <= R."""
    qid = np.arange(nq, dtype=np.int64)
    c0 = (qid * C.A1 + DIAMOND_C_OFF[0]) % M
    c1 = (qid * C.A2 + DIAMOND_C_OFF[1]) % M
    R = DIAMOND_R_BASE + (qid * C.A3 + DIAMOND_R_OFF) % DIAMOND_R_MOD
    vx = [[int(a + r), int(a), int(a - r), int(a)] for a, r in zip(c0, R)]
    vy = [[int(b), int(b + r), int(b), int(b - r)] for b, r in zip(c1, R)]
    return pd.DataFrame({"qid": qid, "vx": vx, "vy": vy, "c0": c0, "c1": c1, "r": R})
