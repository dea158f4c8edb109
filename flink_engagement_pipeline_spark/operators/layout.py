"""Data-layout operators: Z-order (Morton) keys and range-clustered
writes.

At 100 TB the dominant cost of most queries is the scan; clustering
files so parquet min/max statistics prune for MORE THAN ONE predicate
column is the standard fix (Delta/Iceberg ``OPTIMIZE ZORDER BY``).
The key is a pure codegen'd integer expression; the layout step is one
range shuffle + partition-local sort — exactly the cost of any big
sorted write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of x (even bit positions) and y
    (odd positions) into one Morton key.

    Unrolled shift/mask terms — stays inside whole-stage codegen, no
    UDF. Oracle equivalent per bit b:
    ``((x >> b) & 1) * 2^(2b) + ((y >> b) & 1) * 2^(2b+1)``.
    """
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    key = None
    for b in range(bits):
        t = F.shiftright(xm, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b)) + (
            F.shiftright(ym, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b + 1))
        )
        key = t if key is None else key + t
    return key


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for a Z-ordered write: attach the Morton key,
    range-partition on it (RangePartitioning — contiguous key ranges
    per output file, which is what makes min/max pruning effective),
    and sort within partitions. Write the result with any file sink;
    each file then covers a tight (x, y) rectangle."""
    out = df.withColumn("zkey", zorder_key(x, y, bits))
    rp = (
        out.repartitionByRange(partitions, "zkey")
        if partitions
        else out.repartitionByRange("zkey")
    )
    return rp.sortWithinPartitions("zkey")
