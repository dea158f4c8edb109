"""JDBC dimension source (SURVEY.md §2 S3).

The reference's dimension table is a JDBC-scanned Postgres table
(reference src/process.py:145-160: per-event JDBC lookup join with no
cache options). Spark's native equivalent is a ``format("jdbc")``
batch read of the whole dimension, broadcast into the stream-static
join (``operators/enrich.py``) — one scan per (micro)batch instead of
one round-trip per event, which is the whole reason the Spark form
survives production event rates.

What matters at 100 TB (well, at 100M-row dimensions — dims are the
SMALL side) is the read's partitioning discipline, encoded here:

- ``partitionColumn/lowerBound/upperBound/numPartitions``: without
  them Spark reads the whole table through ONE connection on one
  executor; with them the scan fans out into ``numPartitions`` range
  predicates (``WHERE pcol >= l AND pcol < u``) executed in parallel.
- ``fetchsize``: JDBC drivers default to tiny row buffers (Postgres:
  stream-nothing until 0, then everything); a few thousand keeps the
  cursor streaming without per-row round-trips.
- ``pushDownPredicate`` stays on (default) so dim filters run in the
  database, not in Spark.

No database ships in this container, so the *builder* is the tested
surface (option correctness, the part that silently degrades when
wrong); the reader it returns is the stock JDBC source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_scan_options(
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 4096,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """The option map for a partitioned JDBC dim scan (pure; tested).

    Raises rather than silently producing a single-connection scan
    when partitioning is half-specified — the failure mode is not an
    error but a 1-thread read that "works" until the dim grows.
    """
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                "(Spark turns them into per-partition range predicates)"
            )
        if upper_bound <= lower_bound:
            raise ValueError("upper_bound must be > lower_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions if num_partitions is not None else 8),
        )
    elif num_partitions is not None:
        # None (not a default int) is the no-partitioning sentinel: an
        # explicit num_partitions=8 without partition_column must raise
        # too, or the caller gets the 1-connection scan they asked to
        # avoid.
        raise ValueError(
            "num_partitions has no effect without partition_column: "
            "Spark would still read through one connection"
        )
    opts.update(extra or {})
    return opts


def load_dim_via_jdbc(
    spark: SparkSession, url: str, table: str, **kwargs
) -> DataFrame:
    """Partitioned JDBC dim read — needs a reachable database."""
    return spark.read.format("jdbc").options(**jdbc_scan_options(url, table, **kwargs)).load()
