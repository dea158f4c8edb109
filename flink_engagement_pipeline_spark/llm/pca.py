"""Power-iteration top principal component with an exact cross-engine
oracle — the iterative LINEAR-ALGEBRA member of the quantized-iteration
family (k-means in cluster.py, PageRank in operators/graph.py, PQ in
pq.py).

Each iteration is one corpus aggregation producing DIM integer sums
(metadata on the driver, like the k-means centroid update):

  p        = x . v            per row (sequential fold — engine-exact)
  qp       = floor(p * 1e6 + 0.5)                integer micro-units
  s_d      = sum over rows of floor(x_d * qp + 0.5)   ORDER-INDEPENDENT
  v'_d     = s_d / sqrt(sum_d s_d^2)

The norm's sum of squares accumulates in exact integer arithmetic
(DECIMAL(38,0) / HUGEINT — s_d^2 overflows int64), and IEEE-754
requires correctly-rounded sqrt, so the normalized vector is
bit-identical across engines without quantizing the division. The
whole recursion therefore unrolls into SQL CTEs and hash-matches.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIM = 64
PI_ITERS = 2


def _dot_lit_arr(v: Column, lit_vec: list[float]) -> Column:
    """Sequential-fold dot of an array column against literal floats —
    same IEEE order as list_dot_product."""
    acc: Column = F.lit(0.0)
    for i, x in enumerate(lit_vec):
        acc = acc + v.getItem(i) * F.lit(float(x))
    return acc


def top_component_scores(emb: DataFrame, iters: int = PI_ITERS) -> DataFrame:
    """Returns (vec_id, pc1_score): each vector's projection onto the
    power-iterated top principal direction (uncentered — the dominant
    direction of the raw second moment, the whitening/outlier axis).

    Driver state per iteration: DIM integer sums. The projection
    itself is a pure fold expression — zero shuffle at any scale."""
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    v = [1.0] + [0.0] * (DIM - 1)
    for _ in range(iters):
        qp = F.floor(_dot_lit_arr(F.col("v"), v) * 1e6 + F.lit(0.5)).cast(
            "long"
        )
        rows = (
            e.select(F.posexplode("v").alias("dim", "x"), qp.alias("qp"))
            .groupBy("dim")
            .agg(
                F.sum(
                    F.floor(F.col("x") * F.col("qp") + F.lit(0.5)).cast("long")
                ).alias("s")
            )
            .collect()
        )
        s = [0] * DIM
        for r in rows:
            s[r["dim"]] = int(r["s"])
        total_sq = sum(x * x for x in s)  # exact int (mirrors DECIMAL sum)
        norm = math.sqrt(float(total_sq))
        v = [float(x) / norm for x in s]
    return e.select(
        "vec_id", _dot_lit_arr(F.col("v"), v).alias("pc1_score")
    )


def power_iteration_oracle_sql(iters: int = PI_ITERS) -> str:
    """Unrolled SQL twin: v0 = e_0; per iteration the same quantized
    per-dim integer sums, HUGEINT sum of squares, IEEE sqrt norm."""
    parts = [
        "WITH e0 AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"""v0 AS (
  SELECT i.i AS dim, CASE WHEN i.i = 1 THEN CAST(1.0 AS DOUBLE)
                          ELSE CAST(0.0 AS DOUBLE) END AS val
  FROM range(1, {DIM + 1}) i(i)
)""",
    ]
    for it in range(1, iters + 1):
        prev = f"v{it - 1}"
        parts.append(
            f"""p{it} AS (
  SELECT vec_id,
         CAST(floor(list_dot_product(e.v,
               (SELECT list(val ORDER BY dim) FROM {prev})) * 1e6
               + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qp
  FROM e0 e
)"""
        )
        parts.append(
            f"""s{it} AS (
  SELECT t.i AS dim,
         CAST(sum(CAST(floor(e.v[t.i] * p.qp + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS s
  FROM e0 e JOIN p{it} p USING (vec_id), range(1, {DIM + 1}) t(i)
  GROUP BY t.i
)"""
        )
        parts.append(
            f"""v{it} AS (
  SELECT dim,
         CAST(s AS DOUBLE)
           / sqrt(CAST((SELECT sum(CAST(s AS HUGEINT) * s) FROM s{it})
                       AS DOUBLE)) AS val
  FROM s{it}
)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT vec_id,
       list_dot_product(e.v, (SELECT list(val ORDER BY dim) FROM v{iters}))
           AS pc1_score
FROM e0 e
"""
    )
