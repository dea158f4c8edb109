"""Spark-vs-DuckDB oracle comparison, mirroring the driver's check:
row count + schema width + order-insensitive value comparison with
columns sorted by name (SURVEY.md §5.2)."""

from __future__ import annotations

import math

import duckdb

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_run(sql: str, sf_dir: str):
    """Run oracle SQL with fixture tables pre-registered as views
    (same contract as the driver)."""
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format with full precision
        return repr(v + 0.0)
    return v


def canon_rows(df_pandas):
    """Columns sorted by name, rows as canonicalized sorted tuples."""
    cols = sorted(df_pandas.columns)
    pdf = df_pandas[cols]
    rows = []
    for row in pdf.itertuples(index=False, name=None):
        rows.append(tuple(str(_canon(_to_py(v))) for v in row))
    return cols, sorted(rows)


def _to_py(v):
    # numpy / pandas scalars -> python
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        try:
            return v.item()
        except (ValueError, AttributeError):
            pass
    if v is not None and str(type(v)) == "<class 'pandas._libs.tslibs.timestamps.Timestamp'>":
        return v.to_pydatetime()
    # NaN is NOT collapsed to None here — _canon distinguishes NaN from
    # NULL so a Spark-NaN vs oracle-NULL divergence fails the check.
    return v


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, *, max_diff_show: int = 5):
    spark_pdf = spark_df.toPandas()
    duck_pdf = duckdb_run(oracle_sql, sf_dir)

    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} duckdb={len(duck_pdf)}"
    )
    s_cols, s_rows = canon_rows(spark_pdf)
    d_cols, d_rows = canon_rows(duck_pdf)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:max_diff_show]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(s_rows, d_rows) if a != b)} rows differ); "
            f"first diffs (spark, duckdb): {diffs}"
        )
