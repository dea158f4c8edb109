"""Latest-per-key upsert dedup (SURVEY.md §2.9 T4, §1.1 changelog).

The reference's core data abstraction is a keyed changelog: every
table declares ``PRIMARY KEY (id) NOT ENFORCED`` over upsert-Kafka
(reference src/ingest.py:19,47, src/process.py:133), so the *latest*
row per key is the table's state. Structured Streaming has no
changelog relations, so we implement the semantics explicitly as the
standard Spark pattern: ``row_number() OVER (PARTITION BY key ORDER BY
version DESC) = 1``.

Scale notes:
- one shuffle on the key, no self-join (a join-based dedup would
  shuffle twice and blow up on hot keys);
- the ORDER BY is a *total* order (ts, then every remaining column)
  so the survivor is deterministic even when versions tie — required
  for the hash-matching oracle, and the right call in production too
  (rerunning the job must pick the same rows);
- for sharply skewed keys AQE skew-join doesn't apply to window
  functions; the mitigation at 100 TB is two-phase: pre-aggregate
  ``max_by`` within salted sub-keys, then re-reduce. Not needed at
  fixture scale; documented here as the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic total tie-break order after the version column.
_TIEBREAK = ("value", "event_type", "user_id", "props")


def latest_per_key(
    df: DataFrame, key: str = "event_id", version: str = "ts"
) -> DataFrame:
    """Keep the newest row per key; fully deterministic under ties."""
    order = [F.col(version).desc_nulls_last()] + [
        F.col(c).desc_nulls_last() for c in _TIEBREAK if c in df.columns and c != key
    ]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


DEDUP_ORACLE_SQL = """
SELECT event_id, ts, user_id, event_type, value, props
FROM (
    SELECT
        *,
        row_number() OVER (
            PARTITION BY event_id
            ORDER BY ts DESC NULLS LAST, value DESC NULLS LAST,
                     event_type DESC NULLS LAST, user_id DESC NULLS LAST,
                     props DESC NULLS LAST
        ) AS rn
    FROM events
)
WHERE rn = 1
"""
