"""Small plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Round-robin repartition to the session's default parallelism —
    but only when the input has fewer partitions than
    ``min_factor * defaultParallelism``.

    Why: the fixtures are single-row-group parquet files, so a scan
    yields ONE partition and any per-row-heavy operator (MinHash,
    SimHash, shingle explode, decimal aggregation) runs single-
    threaded. On a real cluster the input arrives in thousands of
    splits and this is a no-op — the condition makes the repartition
    a local-small-file fix, not a 100 TB shuffle tax.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Partition count via the compiled JVM RDD (queryExecution().toRdd()),
    # NOT outputPartitioning(): file scans report UnknownPartitioning
    # with numPartitions=0, which would make the guard always fire and
    # add an unconditional round-robin shuffle. toRdd() exposes the real
    # split count without building the Python-side RDD wrapper.
    n_in = df._jdf.queryExecution().toRdd().getNumPartitions()
    if n_in < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df
