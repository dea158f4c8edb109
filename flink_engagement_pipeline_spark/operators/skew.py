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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_from: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt-replicate the small side.

    A shuffle join on a power-law key funnels the hot key's rows into
    one task. Salting fixes it without AQE: every dim row is
    replicated ``n_salts`` times (one per salt id), each fact row gets
    a deterministic salt from an intra-row hash, and the join runs on
    (key, salt) — the hot key's rows spread over ``n_salts`` tasks.
    The dim side grows n_salts x, which is exactly the trade: pay a
    bounded replication of the SMALL side to split the unbounded hot
    key on the BIG side. Join semantics are unchanged (each fact row
    matches exactly the one replica carrying its salt).

    The shuffle-hash hint pins a shuffled join: a broadcast join has
    no skew problem (and needs no salt), so the registered query
    disables the broadcast path to exercise the pattern it exists
    for. Salt is a deterministic hash of ``salt_from`` — an intra-row
    attribute that must NOT be the join key (a hot key hashing to one
    salt would defeat the spread), and never rand(), so retries and
    replays are idempotent.
    """
    salt_col: Column = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    fact_s = fact.withColumn("__salt", salt_col.cast("int"))
    joined = fact_s.join(
        dim_rep.hint("shuffle_hash"),
        (F.col(fact_key) == F.col(dim_key))
        & (fact_s["__salt"] == dim_rep["__salt"]),
    )
    return joined.drop(fact_s["__salt"]).drop(dim_rep["__salt"])


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
