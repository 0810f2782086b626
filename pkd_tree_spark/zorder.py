"""Z-order (Morton) encoding — the distributed analog of the kd-tree's
interleaved multi-level splitters.

The reference builds 6 levels of median splitters per round
(include/cpdd/batch_op/build_tree.hpp:19-70, divide_rotate / pick_pivots);
each 1-bit step of a d-dim Morton key is exactly one rotate-dimension split
level, so a Morton prefix of length d*L reproduces an L-level rotate-split
skeleton with data-independent (grid-midpoint) cut values. Skew is then
neutralized by ``repartitionByRange`` on the key, whose reservoir-sampled
range bounds play the role of the reference's pick_pivots sampling
(build_tree.hpp:48-70).

All encoding is vectorized numpy inside Arrow-batched pandas UDFs — no
per-row Python (input_hint requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .config import GRID_BITS

__all__ = ["morton_encode_np", "morton_decode_np", "morton_col", "cell_col"]


def morton_encode_np(coords: np.ndarray, bits: int = GRID_BITS) -> np.ndarray:
    """Interleave ``coords`` (shape (n, d), non-negative ints < 2**bits)
    into int64 Morton keys, MSB-first across dimensions.

    Bit b of dim j lands at position b*d + (d-1-j), so dim 0 owns the most
    significant bit of each group — matching a rotate-dim split order that
    cuts dim 0 first (reference DIM-rotate rule, kdTreeParallel.h:78).
    Vectorized per-bit OR: bits*d ops on whole arrays, no per-row Python.
    """
    coords = np.asarray(coords, dtype=np.uint64)
    n, d = coords.shape
    assert bits * d <= 63, "morton key must fit a signed int64"
    out = np.zeros(n, dtype=np.uint64)
    for b in range(bits):  # bit position within each coordinate
        src = np.uint64(b)
        for j in range(d):
            dst = np.uint64(b * d + (d - 1 - j))
            out |= ((coords[:, j] >> src) & np.uint64(1)) << dst
    return out.astype(np.int64)


def morton_decode_np(keys: np.ndarray, d: int, bits: int = GRID_BITS) -> np.ndarray:
    """Inverse of :func:`morton_encode_np`; returns shape (n, d)."""
    k = np.asarray(keys, dtype=np.uint64)
    out = np.zeros((k.shape[0], d), dtype=np.uint64)
    for b in range(bits):
        for j in range(d):
            src = np.uint64(b * d + (d - 1 - j))
            out[:, j] |= ((k >> src) & np.uint64(1)) << np.uint64(b)
    return out.astype(np.int64)


def morton_col(cols: list[Column | str], d: int, bits: int = GRID_BITS) -> Column:
    """Morton key as a Spark Column from d integer coordinate columns
    (Column objects or SQL expression strings).

    Pure JVM expression — a sum of d*bits disjoint single-bit terms
    ((x_j >> b & 1) << (b*d + d-1-j)) that whole-stage codegen fuses into
    one generated function. Keeping the encode JVM-side removes the only
    Python/Arrow hop from the index-build path (the scan -> encode ->
    range-partition pipeline is then a single codegen stage up to the
    exchange). The numpy twin (morton_encode_np) is used driver-side for
    covers/rings and is property-tested for equality against this.

    Built as ONE F.expr over a generated SQL string: the Column-by-Column
    form issued ~4 py4j round-trips per term (d*bits terms = 160+ calls,
    a measured ~0.15s of pure driver latency per call site — per STEP in
    iterative update loops)."""
    sqls = []
    for c in cols:
        if isinstance(c, str):
            sqls.append(f"CAST(({c}) AS BIGINT)")
        else:
            # Column.__repr__ is "Column<'sql'>" — extract the SQL text so
            # legacy Column callers keep working through the single-expr path
            s = str(c)
            sqls.append(f"CAST(({s[8:-2]}) AS BIGINT)")
    terms = []
    for j, cs in enumerate(sqls):
        for b in range(bits):
            dst = b * d + (d - 1 - j)
            terms.append(f"shiftleft(shiftrightunsigned({cs}, {b}) & 1, {dst})")
    return F.expr(" + ".join(terms))


def morton_col_pandas(cols: list[Column], d: int, bits: int = GRID_BITS) -> Column:
    """Arrow-batched pandas-UDF variant of morton_col (kept for parity
    testing and as the template for UDF-based encodes)."""

    @F.pandas_udf(LongType())
    def _enc(*series: pd.Series) -> pd.Series:
        arr = np.stack([s.to_numpy(dtype=np.int64) for s in series], axis=1)
        return pd.Series(morton_encode_np(arr, bits=bits))

    return _enc(*cols)


def cell_col(morton: Column, d: int, level: int, bits: int = GRID_BITS) -> Column:
    """Level-``level`` cell id from a Morton key — a pure JVM shift.

    The cell id is the Morton prefix of length d*level; cells at a level
    correspond to contiguous Morton ranges, which is what makes partition
    pruning on the sorted key work (the containment short-circuit of
    range_count.hpp:79-80 becomes metadata lookup + file skipping).
    """
    return F.shiftrightunsigned(morton, d * (bits - level))
