"""Batch table sources: parquet scans with explicit schemas.

Plays the role of the reference's table DDL (reference
src/ingest.py:9-32, src/process.py:122-160): every table is declared,
never inferred. Parquet scans get column pruning + predicate pushdown
from Catalyst for free — the `.explain()` of downstream queries must
show ReadSchema restricted to used columns and PushedFilters for any
literal predicates; that is the 100 TB contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with its declared schema.

    ``schema(...)`` on a parquet read prunes to the declared columns and
    fixes types (timestamp[ns] -> TimestampType microseconds) instead of
    trusting file metadata — the reference's explicit-DDL discipline.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    return spark.read.schema(TABLES[name]).parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (the SQL front door,
    mirroring the reference's catalog registration step, reference
    src/process.py:122-160)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
