"""Core reference-parity queries (SURVEY.md §2).

Each query maps a capability of the reference pipeline (file:line cited
per query) onto the driver fixtures with ``events`` as the fact stream
and ``customer`` as the dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.enrich import ENRICH_ORACLE_SQL, enrich_events
from ..sources.tables import load_table
from .registry import register


@register(
    "enrich_events",
    oracle=ENRICH_ORACLE_SQL,
    doc=(
        "Reference core query: temporal lookup LEFT join + derived "
        "engagement metrics (reference src/process.py:163-183). "
        "Broadcast stream-static hash join; zero shuffle of the fact side."
    ),
    bench=True,
    tags=("join", "projection", "case-when", "round", "cast"),
)
def q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer")
    return enrich_events(events, dim)
