"""Property-based tests (hypothesis) for the cover machinery — the
correctness core of every range operator: covers must be (a) disjoint,
(b) complete (every in-region grid point falls in some cover cell),
(c) sound on interior cells (every point of an interior cell is in-region).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pkd_tree_spark.config import EngineConfig
from pkd_tree_spark.index import BallRegion, BoxRegion, cover_regions
from pkd_tree_spark.zorder import morton_decode_np, morton_encode_np

CFG = EngineConfig(dims=2, index_level=6, knn_level=4, partitions=4)
M = 1 << CFG.coord_bits

coord = st.integers(min_value=0, max_value=M - 1)


def _cover_cells_ranges(cov):
    """Each cover cell as a morton interval at index_level granularity."""
    d, L = CFG.dims, CFG.index_level
    out = []
    for r in cov.itertuples():
        span = d * (L - r.level)
        lo = r.cell << span
        hi = ((r.cell + 1) << span) - 1
        out.append((lo, hi, bool(r.interior), int(r.level)))
    return out


@settings(max_examples=30, deadline=None)
@given(coord, coord, coord, coord)
def test_box_cover_disjoint_and_complete(ax, ay, bx, by):
    qlo = np.minimum([ax, ay], [bx, by])
    qhi = np.maximum([ax, ay], [bx, by])
    cov = cover_regions([(0, BoxRegion(qlo, qhi))], CFG, budget=256)
    ranges = _cover_cells_ranges(cov)
    # disjoint morton intervals
    srt = sorted(ranges)
    for (l1, h1, *_), (l2, h2, *_) in zip(srt, srt[1:]):
        assert h1 < l2, "cover cells overlap"
    # complete + interior-sound on a sample of grid points
    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.integers(qlo[j], qhi[j] + 1, size=200) for j in range(2)], axis=1
    )
    keys = morton_encode_np(pts >> CFG.coord_shift, bits=CFG.grid_bits)
    lk = keys >> (2 * (CFG.grid_bits - CFG.index_level))
    for k in lk:
        assert any(lo <= k <= hi for lo, hi, *_ in ranges), "in-box point not covered"
    # interior soundness: corners of interior cells lie inside the box
    for lo, hi, interior, level in ranges:
        if not interior:
            continue
        cell = lo >> (2 * (CFG.index_level - level))
        g = morton_decode_np(np.array([cell]), 2, bits=level)[0]
        w = CFG.width_at(level)
        clo, chi = g * w, g * w + w - 1
        assert np.all(clo >= qlo) and np.all(chi <= qhi)


@settings(max_examples=30, deadline=None)
@given(coord, coord, st.integers(min_value=1, max_value=400_000))
def test_ball_cover_complete(cx, cy, r):
    region = BallRegion([cx, cy], r * r)
    cov = cover_regions([(0, region)], CFG, budget=256)
    ranges = _cover_cells_ranges(cov)
    rng = np.random.default_rng(1)
    # sample points inside the ball (rejection from bounding box)
    lo = np.maximum([cx - r, cy - r], 0)
    hi = np.minimum([cx + r, cy + r], M - 1)
    pts = np.stack([rng.integers(lo[j], hi[j] + 1, size=500) for j in range(2)], axis=1)
    d2 = ((pts - [cx, cy]) ** 2).sum(axis=1)
    pts = pts[d2 <= r * r]
    if len(pts) == 0:
        return
    keys = morton_encode_np(pts >> CFG.coord_shift, bits=CFG.grid_bits)
    lk = keys >> (2 * (CFG.grid_bits - CFG.index_level))
    for k in lk:
        assert any(a <= k <= b for a, b, *_ in ranges), "in-ball point not covered"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=200))
def test_morton_roundtrip_property(pairs):
    pts = np.array(pairs, dtype=np.int64)
    keys = morton_encode_np(pts, bits=20)
    back = morton_decode_np(keys, 2, bits=20)
    assert np.array_equal(pts, back)
