"""Scalar expression helpers for the engagement-enrichment surface.

Each helper is a pure Column expression (JVM-side, whole-stage
codegen'd) — never a Python UDF. They reproduce the scalar-function
surface the reference exercises (reference src/process.py:163-183,
SURVEY.md §2.3/§2.10): CAST, arithmetic, ROUND, CASE WHEN, comparison,
aliasing, JSON extraction of the opaque payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def engagement_seconds(value: Column | str) -> Column:
    """``CAST(value AS DOUBLE) / 1000.0`` — the reference's duration_ms
    -> seconds conversion (reference src/process.py:172); NULL in, NULL out."""
    col = F.col(value) if isinstance(value, str) else value
    return (col.cast("double") / F.lit(1000.0)).alias("engagement_seconds")


def engagement_pct(value: Column | str, denom: Column | str, scale: int = 4) -> Column:
    """``CASE WHEN denom > 0 THEN ROUND(value / denom, scale) ELSE NULL END``
    — the divide-by-zero / missing-dimension guard (reference
    src/process.py:173-176). A non-positive or NULL denominator yields
    NULL, matching the reference's CASE fall-through."""
    v = F.col(value) if isinstance(value, str) else value
    d = F.col(denom) if isinstance(denom, str) else denom
    return (
        F.when(d > 0, F.round(v.cast("double") / d, scale))
        .otherwise(F.lit(None).cast("double"))
        .alias("engagement_pct")
    )


def props_get(props: Column | str, key: str) -> Column:
    """Extract a key from the opaque JSON payload (the reference carries
    ``raw_payload`` as a JSON string and never parses it in-engine,
    reference sql/init.sql:20; this is the extended-surface parser,
    SURVEY.md §7 Phase 1)."""
    col = F.col(props) if isinstance(props, str) else props
    return F.get_json_object(col, f"$.{key}")
