"""As-of (backward temporal) join — a custom operator Spark lacks
natively (SURVEY.md lists temporal joins as a capability the engine
should expose; the reference's lookup join is the processing-time
special case of this event-time general form).

Semantics: for each left row, attach the single right row with the
same key and the greatest right-time <= left-time (NULLs when no such
row exists) — e.g. "the user's most recent order as of the event".

Implementation is the **union-merge pattern**, not a range join:

1. union the two inputs with a side tag, right rows carrying their
   payload columns, left rows carrying NULL payloads;
2. one window per key ordered by (time, side, right-tiebreak):
   ``last(payload, ignorenulls=True)`` over UNBOUNDED
   PRECEDING..CURRENT ROW carries the latest right payload forward;
3. keep only left rows.

Cost at scale: ONE shuffle on the key + a per-partition sort — the
same price as a regular sort-merge join. The naive alternatives
(range-condition theta join = broadcast nested loop; per-left-row
probe = O(n*m)) are both scale-killers. Right rows sort *before* left
rows at equal time, so right-time == left-time matches (<=, the
standard as-of convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of-backward join; output = all left columns + payload_cols.

    ``tiebreak`` orders right rows that share (key, time) so the
    carried row is deterministic (required for the oracle and for
    rerun stability).
    """
    l_tag = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r_tag = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(c) for c in payload_cols],
    )
    unioned = l_tag.unionByName(r_tag)

    order = [F.col("__t").asc(), F.col("__is_left").asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__carry_{c}").alias(c) for c in payload_cols],
    )
