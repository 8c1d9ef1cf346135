"""Hierarchical cell encodings — quadkey / Morton (Z-order) ids and
k-rings over the slippy quadtree.

The north star asks for "H3/S2 cell encoding" alongside z/x/y; without
the h3/s2 libraries in this container we provide the equivalent
public-formula quadtree encodings (an S2 cell id is a face-local Hilbert
position; a Bing quadkey / Morton code is the same idea on the Mercator
quadtree — every slippy tile IS a quadtree cell):

* ``morton(x, y)``   — bit-interleaved Z-order index (locality-preserving
  sort key for range scans / clustering the tile table on disk),
* ``quadkey(z,x,y)`` — Bing-style base-4 string, prefix = ancestor cell,
* ``k_ring(x,y,k)``  — the (2k+1)² neighbourhood used by the kNN
  candidate generator (H3 k-ring analog, operators/knn.knn_tiled).

All vectorized numpy; ``morton_col`` provides the same as a JVM column
expression for writers that cluster output by curve position.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of v into even bit positions."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton(x, y) -> np.ndarray:
    """Interleave 16-bit x, y → 32-bit Z-order index (x in even bits)."""
    return (_part1by1(np.asarray(x)) | (_part1by1(np.asarray(y)) << np.uint64(1))).astype(np.int64)


def demorton(m) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(m, dtype=np.uint64)

    def compact(v):
        v = v.copy()  # &= would mutate the caller's array
        v &= np.uint64(0x55555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x33333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF)
        return v.astype(np.int64)

    return compact(m), compact(m >> np.uint64(1))


def quadkey(z: int, x, y):
    """Bing-maps quadkey strings; parent cell = string prefix."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    out = np.empty(x.shape, dtype=object)
    for i in np.ndindex(x.shape):
        digits = []
        for level in range(z, 0, -1):
            mask = 1 << (level - 1)
            digits.append(str(((x[i] & mask) > 0) + 2 * ((y[i] & mask) > 0)))
        out[i] = "".join(digits)
    return out


def parse_quadkey(qk: str) -> tuple[int, int, int]:
    x = y = 0
    for c in qk:
        d = int(c)
        x = (x << 1) | (d & 1)
        y = (y << 1) | (d >> 1)
    return len(qk), x, y


def k_ring(x: int, y: int, k: int, zoom: int) -> list[tuple[int, int]]:
    """(2k+1)² neighbourhood clamped to the tile grid — H3 k-ring analog."""
    n = 1 << zoom
    return [
        (x + dx, y + dy)
        for dx in range(-k, k + 1) for dy in range(-k, k + 1)
        if 0 <= x + dx < n and 0 <= y + dy < n
    ]


def morton_col(x: Column, y: Column) -> Column:
    """JVM-side Morton index (bit-spread via shifts/masks) — use as a
    sort/cluster key when writing the tile table so neighbouring tiles
    land in the same files (locality for k-ring reads)."""

    def spread(c: Column) -> Column:
        # Column `|` is logical OR — bitwiseOR is required here
        c = c.bitwiseAND(F.lit(0xFFFF))
        c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
        c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
        c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
        return c

    return spread(x).bitwiseOR(F.shiftleft(spread(y), 1)).cast("long")
