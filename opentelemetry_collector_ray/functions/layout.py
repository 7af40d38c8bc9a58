"""Data-layout keys for multi-dimensional sink clustering.

At 100 TB, predicate pruning is the cheapest query accelerator the
engine controls: Parquet readers skip row groups whose min/max stats
exclude the filter. A sort on ONE column only clusters that column;
sorting by a Z-ORDER (Morton) key interleaves the bits of several
columns so row groups stay tight in every interleaved dimension at
once — two-dimensional filters (user × value, service × time) prune
row groups that a single-column sort cannot.

All bit math is plain int64 shift/mask arithmetic, vectorized in numpy
and expressible verbatim in SQL, so the key is engine-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# spread a 16-bit int so its bits occupy even positions (0,2,4,...)
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(x: np.ndarray) -> np.ndarray:
    x = x & 0xFFFF
    for shift, mask in _SPREAD:
        x = (x | (x << shift)) & mask
    return x


def zorder_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton interleave of two 16-bit dimensions (x in even bit
    positions, y in odd): a 32-bit key whose sort order walks the
    Z-curve. Inputs are masked to their low 16 bits — quantize wider
    domains to 16-bit ranks first."""
    return _spread16(x.astype(np.int64)) | (
        _spread16(y.astype(np.int64)) << 1
    )


def zorder_batch(
    batch: pa.Table,
    *,
    x: str,
    y: str,
    out: str = "zkey",
) -> pa.Table:
    """Append the Z-order key of columns ``x`` and ``y`` — stateless,
    zero shuffle; feed the result into ``Dataset.sort(out)`` ahead of a
    partitioned sink write to cluster row groups in both dimensions."""
    xc, yc = batch[x], batch[y]
    if isinstance(xc, pa.ChunkedArray):
        xc = xc.combine_chunks()
    if isinstance(yc, pa.ChunkedArray):
        yc = yc.combine_chunks()
    # null-safe: a blind astype(int64) turns NaN into INT64_MIN and
    # bit-spreads garbage (the CLAUDE.md trap; found by the
    # null-parity gate) — fill for the arithmetic, mask the output
    valid = pc.and_(pc.is_valid(xc), pc.is_valid(yc))
    vnp = np.asarray(valid.to_numpy(zero_copy_only=False), dtype=bool)
    xa = pc.fill_null(pc.cast(xc, pa.int64()), 0).to_numpy()
    ya = pc.fill_null(pc.cast(yc, pa.int64()), 0).to_numpy()
    return batch.append_column(
        out, pa.array(zorder_key(xa, ya), type=pa.int64(), mask=~vnp)
    )
