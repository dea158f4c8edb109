"""Property tests for the Z-order key (operators/layout.py): the
Morton interleave must be a bijection on 16-bit pairs (a collision
would merge unrelated (x, y) cells and silently break min/max
pruning), and the Spark expression must agree with an independent
pure-python mirror."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _z_py(x: int, y: int, bits: int = 16) -> int:
    key = 0
    for b in range(bits):
        key += ((x >> b) & 1) << (2 * b)
        key += ((y >> b) & 1) << (2 * b + 1)
    return key


def _unz_py(z: int, bits: int = 16) -> tuple[int, int]:
    x = y = 0
    for b in range(bits):
        x |= ((z >> (2 * b)) & 1) << b
        y |= ((z >> (2 * b + 1)) & 1) << b
    return x, y


@given(
    st.integers(min_value=0, max_value=0xFFFF),
    st.integers(min_value=0, max_value=0xFFFF),
)
@settings(max_examples=300, deadline=None)
def test_zorder_key_is_bijective(x, y):
    z = _z_py(x, y)
    assert 0 <= z < 1 << 32
    assert _unz_py(z) == (x, y)


def test_zorder_spark_matches_python_mirror(spark):
    import random

    from pyspark.sql import functions as F

    from flink_engagement_pipeline_spark.operators.layout import zorder_key

    rng = random.Random(7)
    rows = [
        (rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16))
        for _ in range(512)
    ] + [(0, 0), (0xFFFF, 0xFFFF), (0xFFFF, 0), (0, 0xFFFF)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = (
        df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z"))
        .collect()
    )
    for r in got:
        assert r["z"] == _z_py(r["x"], r["y"]), (r["x"], r["y"])
