"""Z-order clustered tile layout + quadtree bbox range pruning.

``write_tiles`` hash-buckets tiles (uniform load, point lookups); this
sink is the complementary RANGE layout: cluster the tile relation by
Morton curve position (``repartitionByRange`` + sort on ``morton``), so
each output file owns a compact, locality-preserving cell-id interval —
the z-ordering Iceberg/Delta apply to spatial tables.  A bbox query
then decomposes into O(perimeter) aligned quadtree Morton intervals
(``bbox_morton_ranges``); the OR-of-BETWEEN predicate reaches the
parquet scan, and because the layout made per-file/row-group morton
min-max ranges DISJOINT and tight, data skipping eliminates the files
outside the box — at 100 TB a city-sized bbox touches a handful of
files instead of the whole planet.

Correctness does not depend on the decomposition: ranges may be merged
(``max_ranges`` caps predicate size, admitting supersets) because the
exact x/y bbox filter is always re-applied after the range scan.

Morton-interval property used: an aligned 2^k × 2^k quadtree cell with
corner (x0, y0) covers exactly the contiguous Z-curve interval
[morton(x0, y0), morton(x0, y0) + 4^k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapsplit_spark.cellid import morton_col

_BITS = 16  # tile coords < 2^16 (zoom ≤ 16 per-axis domain of cellid)


def write_tiles_zorder(df: DataFrame, out_path: str, n_files: int = 64,
                       x_col: str = "tile_x", y_col: str = "tile_y") -> None:
    """Materialize with Z-order clustering: morton column + range
    repartition + in-file sort → tight disjoint per-file morton stats.
    The morton column is kept in the data so parquet min/max stats (file
    and row-group level) drive skipping on read.

    Raises on tile coords outside the ``_BITS`` morton domain: a coord
    ≥ 2^16 would silently alias to a wrong morton cell and
    ``read_tiles_bbox``'s range predicate would then EXCLUDE the row —
    an in-bbox row silently dropped (the x/y re-filter runs after the
    range scan, so it cannot restore what the ranges pruned).  The guard
    rides the write pass itself (raise_error inside the morton
    projection) — no extra scan of the input."""
    lim = 1 << _BITS
    in_domain = (
        (F.col(x_col) >= 0) & (F.col(x_col) < lim)
        & (F.col(y_col) >= 0) & (F.col(y_col) < lim)
    )
    # NULL coords need their own arm: they fall through to otherwise(),
    # where concat() would be NULL too — an abort with a NULL message
    guarded_morton = F.when(
        F.col(x_col).isNull() | F.col(y_col).isNull(),
        F.raise_error(F.lit(
            "write_tiles_zorder: NULL tile coord — drop or fill null "
            "tile rows before the Z-order sink")).cast("long"),
    ).when(
        in_domain, morton_col(F.col(x_col), F.col(y_col))
    ).otherwise(F.raise_error(F.concat(
        F.lit("write_tiles_zorder: tile coord ("),
        F.col(x_col).cast("string"), F.lit(", "), F.col(y_col).cast("string"),
        F.lit(f") outside the {_BITS}-bit morton domain [0, {lim}) — "
              f"zoom > {_BITS} layouts need a wider morton (raise _BITS "
              f"consistently with bbox_morton_ranges) or a coarser zoom"),
    )).cast("long"))
    (
        df.withColumn("morton", guarded_morton)
        .repartitionByRange(n_files, "morton")
        .sortWithinPartitions("morton")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def _morton_int(x: int, y: int) -> int:
    m = 0
    for b in range(_BITS):
        m |= ((x >> b) & 1) << (2 * b)
        m |= ((y >> b) & 1) << (2 * b + 1)
    return m


def bbox_morton_ranges(x0: int, y0: int, x1: int, y1: int,
                       max_ranges: int = 64) -> list[tuple[int, int]]:
    """Decompose an inclusive tile bbox into aligned quadtree Morton
    intervals (sorted, non-overlapping).  Cells fully inside the box
    emit their whole interval; border cells recurse — O(perimeter)
    ranges.  If more than ``max_ranges`` result, nearest-gap ranges are
    merged (supersets are fine: callers re-filter on x/y)."""
    if x1 < x0 or y1 < y0:
        return []
    out: list[tuple[int, int]] = []

    def rec(level: int, cx: int, cy: int) -> None:
        s = 1 << (_BITS - level)
        bx0, by0 = cx * s, cy * s
        bx1, by1 = bx0 + s - 1, by0 + s - 1
        if bx1 < x0 or bx0 > x1 or by1 < y0 or by0 > y1:
            return
        if x0 <= bx0 and bx1 <= x1 and y0 <= by0 and by1 <= y1:
            m = _morton_int(bx0, by0)
            out.append((m, m + s * s - 1))
            return
        if level == _BITS:
            m = _morton_int(bx0, by0)
            out.append((m, m))
            return
        rec(level + 1, 2 * cx, 2 * cy)
        rec(level + 1, 2 * cx + 1, 2 * cy)
        rec(level + 1, 2 * cx, 2 * cy + 1)
        rec(level + 1, 2 * cx + 1, 2 * cy + 1)

    rec(0, 0, 0)
    out.sort()
    # coalesce adjacent intervals, then merge smallest gaps down to cap
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    while len(merged) > max_ranges:
        gaps = [(merged[i + 1][0] - merged[i][1], i) for i in range(len(merged) - 1)]
        _, i = min(gaps)
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return [(lo, hi) for lo, hi in merged]


def read_tiles_bbox(spark: SparkSession, path: str,
                    x0: int, y0: int, x1: int, y1: int,
                    x_col: str = "tile_x", y_col: str = "tile_y",
                    max_ranges: int = 64) -> DataFrame:
    """Bbox scan over a Z-order layout: OR-of-BETWEEN morton ranges
    (pushed to the parquet scan → file/row-group skipping against the
    clustered min-max stats) + the exact x/y re-filter."""
    ranges = bbox_morton_ranges(x0, y0, x1, y1, max_ranges)
    df = spark.read.parquet(path)
    if not ranges:
        return df.filter(F.lit(False))
    cond = None
    for lo, hi in ranges:
        c = F.col("morton").between(lo, hi)
        cond = c if cond is None else (cond | c)
    return df.filter(cond).filter(
        F.col(x_col).between(x0, x1) & F.col(y_col).between(y0, y1)
    )
