"""Multi-format batch file sources: JSON-lines and CSV with declared
schemas (never inferred — the reference's explicit-DDL discipline,
reference src/ingest.py:9-32, applied to every wire format).

Schema inference on JSON/CSV requires an extra full pass over the data
and produces type drift between runs; at 100 TB both are
disqualifying, so these readers impose the canonical events schema and
parse timestamps explicitly. Malformed rows follow Spark's PERMISSIVE
default (null columns) rather than failing the job; pass
``mode="FAILFAST"`` for strict ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Canonical logical events schema, shared by every wire format.
_EVENTS_LOGICAL = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_events_json(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """JSON-lines events with the declared schema. One narrow scan —
    Jackson parse happens inside the file scan, no extra stage."""
    return (
        spark.read.schema(_EVENTS_LOGICAL)
        .option("mode", mode)
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def read_events_csv(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """Header CSV events with the declared schema."""
    return (
        spark.read.schema(_EVENTS_LOGICAL)
        .option("header", "true")
        .option("mode", mode)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def read_events_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC events with the declared schema imposed (columnar like
    parquet — schema lives in the footer, so no inference pass; the
    declared schema still guards against file drift). ORC's
    TIMESTAMP is microsecond-capable, so the round-trip is lossless
    like parquet's."""
    return spark.read.schema(_EVENTS_LOGICAL).orc(path)


def write_events_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_events_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)


def write_events_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )
