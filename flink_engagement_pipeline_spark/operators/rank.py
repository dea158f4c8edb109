"""Distributed global row numbering — the scale-out form of
``row_number() OVER (ORDER BY ...)``.

An unpartitioned window collapses to ONE task (Exchange SinglePartition
+ global sort) — the classic 100 TB scale-killer. The pattern here
keeps every step distributed:

1. draw a deterministic seeded sample of the order key, sort it on the
   driver, and freeze p-1 range boundaries as plan LITERALS;
2. assign each row a range id ``__pid`` by comparing its key against
   the literal boundaries — a pure per-row projection, no shuffle, and
   (crucially) a *deterministic function of the row*, so every pass
   recomputes identical assignments and nothing needs to be cached;
3. count rows per range (metadata-sized aggregate), cumulate into
   per-range offsets on the driver, broadcast back;
4. hash-partition by ``__pid`` (one Exchange), partition-local sort +
   ``row_number`` + offset = exact global row number.

Earlier revisions used ``repartitionByRange`` + ``.cache()``: Spark's
RangePartitioner samples with an RDD-id-derived seed, so the count pass
and the numbering pass could see different boundaries unless the ranged
relation was pinned — and a leaked session-lifetime cache at 100 TB is
the whole dataset. Literal boundaries remove the nondeterminism at the
source: zero persisted relations, assertable via
``getPersistentRDDs()`` (tests/test_plans.py). The cost is re-scanning
the (column-pruned) input per pass instead of caching it — the right
trade at scale, where a re-scan is cheap and a dataset-sized pin is
not. Boundary-sample skew only affects balance, never correctness: the
order must be TOTAL (include a tiebreak column), and ties compare
identically against the literals so equal keys always land in the same
range. The result is exactly ``row_number() OVER (ORDER BY ...)`` —
verified against the SQL oracle in the registered query.

This is also the "assign stable sample indices to a corpus" primitive
an LLM data pipeline needs after shuffling/filtering (e.g. to address
training samples by position without a single-node sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SAMPLES_PER_PART = 20
_SEED = 42


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    out: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based row numbers under a TOTAL order, with no
    single-partition exchange and no persisted relation. Triggers two
    metadata-sized driver jobs (boundary sample, per-range counts)
    before returning the lazy numbered plan."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # Field names are part of a struct's type: alias both the key and
    # the boundary literals identically so the comparison resolves.
    names = [f"f{i}" for i in range(len(cols))]
    key = F.struct(*[c.alias(a) for c, a in zip(cols, names)])
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism

    n = df.count()
    boundaries: list = []
    if n > 0 and n_parts > 1:
        target = n_parts * _SAMPLES_PER_PART
        fraction = min(1.0, 1.2 * target / n)
        sample = sorted(
            tuple(r["k"]) for r in
            df.select(key.alias("k")).sample(False, fraction, seed=_SEED).collect()
        )
        if sample:
            step = len(sample) / n_parts
            picked = {sample[int(i * step)] for i in range(1, n_parts)}
            boundaries = sorted(picked)

    if boundaries:
        # __pid = number of boundaries strictly below the key. NULL
        # struct comparisons coalesce to 0, so null-keyed rows land in
        # range 0 — consistent with Spark's nulls-first ascending sort.
        pid = sum(
            (
                F.coalesce(
                    (
                        key
                        > F.struct(
                            *[F.lit(v).alias(a) for v, a in zip(b, names)]
                        )
                    ).cast("int"),
                    F.lit(0),
                )
                for b in boundaries
            ),
            F.lit(0),
        )
    else:
        pid = F.lit(0)
    parted = df.withColumn("__pid", pid)

    counts = dict(
        (r["__pid"], r["cnt"])
        for r in parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(p, off) for p, off in offsets.items()] or [(0, 0)], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        parted.join(F.broadcast(off_df), "__pid")
        .withColumn(out, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )
