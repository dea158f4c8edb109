"""Distributed global row numbering — the scale-out form of
``row_number() OVER (ORDER BY ...)``.

An unpartitioned window collapses to ONE task (Exchange SinglePartition
+ global sort) — the classic 100 TB scale-killer. The two-pass pattern
here keeps every step distributed:

1. ``repartitionByRange`` on the order key: Spark samples range
   boundaries, so partition i holds keys entirely before partition i+1.
2. sort within partitions (partition-local, spills).
3. count rows per partition (metadata-sized aggregate), cumulate into
   per-partition offsets on the driver, broadcast back.
4. partition-local ``row_number`` + offset = exact global row number.

The order must be TOTAL (include a tiebreak column): range boundaries
can split equal keys across partitions, which would make ranking of
ties partition-dependent. With a total order the result is exactly
``row_number() OVER (ORDER BY ...)`` — verified against the SQL oracle
in the registered query.

This is also the "assign stable sample indices to a corpus" primitive
an LLM data pipeline needs after shuffling/filtering (e.g. to address
training samples by position without a single-node sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    out: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based row numbers under a TOTAL order, with no
    single-partition exchange. Triggers one metadata-sized job (the
    per-partition counts) before returning; the per-range relation is
    cached for the duration so the count pass and the output pass see
    identical range boundaries."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .cache()
    )
    counts = dict(
        (r["__pid"], r["cnt"])
        for r in parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        parted.join(F.broadcast(off_df), "__pid")
        .withColumn(out, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )
