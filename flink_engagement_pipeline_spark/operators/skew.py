"""Skew-resistant aggregation via salting (SURVEY.md §7 Phase 3 item
14: hot-key mitigation guidance made executable).

AQE's skew-join handling covers joins, but a grouped aggregation with
a hot key still funnels that key's rows into one reducer. The salted
two-phase pattern splits each key into ``n_salts`` sub-keys, partially
aggregates per (key, salt), then re-reduces per key:

    groupBy(key, salt) -> partial sums   (hot key spread over n tasks)
    groupBy(key)       -> final sums     (n rows per key, trivial)

With decimal measures both phases are exact and associative, so the
result is bit-identical to the direct aggregation — asserted in
tests/test_skew.py. The salt is a deterministic hash of intra-row
attributes (not rand()), keeping reruns and retries idempotent.

When to reach for this at 100 TB: keyspace with power-law frequency
(a viral content_id in the reference's domain). For mild skew, AQE +
partial aggregation already suffice; salting pays when one key is a
large fraction of the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import dec


def salted_sum(
    df: DataFrame,
    key: str,
    measure: str,
    n_salts: int = 32,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase salted SUM/COUNT per key, exact under the decimal
    routing. ``salt_from`` names a column whose hash spreads the rows
    (defaults to the measure itself)."""
    salt_col: Column = F.pmod(F.xxhash64(F.col(salt_from or measure)), F.lit(n_salts))
    partial = (
        df.select(F.col(key), dec(measure).alias("__v"), salt_col.alias("__salt"))
        .groupBy(key, "__salt")
        .agg(F.sum("__v").alias("__pv"), F.count("*").alias("__pn"))
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("__pv").cast("double").alias("total_value"),
            F.sum("__pn").alias("n_events"),
        )
    )
