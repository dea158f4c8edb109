"""In-engine classifier training — logistic regression fitted by
EXACT Newton iterations (Platt scaling), as a distributed iterative
operator with a full cross-engine oracle.

The production pattern this models: calibrate a cheap per-document
score into a probability of an independent gate decision — Platt
scaling, the standard score→probability calibration step in ranking
and filtering pipelines (and the 2-parameter core of the
fastText-style quality-classifier loop every published LLM data
pipeline runs). Here the score is the docs_quality heuristic and the
target is the docs_lang_id English gate — two independent signals, so
the fit is a real (non-separable, non-circular) estimation problem.

Why NEWTON and not gradient descent: full-batch GD on this data needs
hundreds of iterations to move off the majority-class predictor
(measured — weights crawl), which is useless as a bounded unrolled
oracle. Newton-IRLS on the 2-parameter model converges in ~4-6
iterations, and its per-iteration work is STILL one corpus scan plus
a metadata-sized aggregation: 5 integer sums (gradient [2] + Hessian
[3, symmetric 2x2]); the 2x2 solve happens on the driver in EXACT
integer arithmetic (Python bigints mirror the oracle's HUGEINT —
determinants reach ~1e18, past double's 2^53, so floating the solve
would lose bits; both engines cast the identical exact integers to
double only for the final division).

Scale shape (the kmeans/pagerank discipline applied to training):
- features/labels are a pure projection of the document scan;
- each Newton iteration: ONE scan + ONE 5-integer aggregation;
  parameters live on the driver (2 doubles) and re-enter the next
  iteration as plan literals — nothing model-sized ever shuffles;
- scoring is a pure projection with literal parameters.

Exactness devices (every expression generated from ONE template per
engine — the one-generator rule):
- the sigmoid is quantized at 1e-6 (floor(p*1e6+0.5)/1e6) to erase
  the JVM-vs-libm exp() ulp (the docs_bm25 ln discipline);
- per-row gradient/Hessian contributions are floor-quantized to
  INTEGER micro-units before summing (order-independent reduction);
- the Newton update (a,b) -= H^-1 g is the same expression tree in
  driver Python and oracle SQL, re-quantized to 1e-6 per iteration
  so the next round's literals are identical doubles in both engines.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as lt

PLATT_ITERS = 6
_Q = 1_000_000.0


def spark_lit(x: float) -> str:
    """Spark-SQL double literal (repr round-trips the exact IEEE
    value; bare 1.0 would parse as DECIMAL)."""
    return f"{float(x)!r}D"


def duck_lit(x: float) -> str:
    return repr(float(x))


def p_expr(aref: str, bref: str, lit: Callable[[float], str]) -> str:
    """Quantized sigmoid of the calibrated score a*s + b — one
    template for both engines; ``aref``/``bref`` are literals (Spark)
    or 1-row-CTE column references (the oracle's unrolled
    recursion)."""
    one, q, half = lit(1.0), lit(_Q), lit(0.5)
    return (
        f"floor(({one} / ({one} + exp(-({aref} * s + {bref}))))"
        f" * {q} + {half}) / {q}"
    )


def newton_sum_exprs(
    aref: str, bref: str, lit: Callable[[float], str]
) -> dict[str, str]:
    """Per-row integer contributions for the Newton step: gradient
    (gs, gb) and the symmetric 2x2 Hessian (hss, hsb, hbb), each
    floor-quantized to micro-units."""
    p = p_expr(aref, bref, lit)
    one, q, half = lit(1.0), lit(_Q), lit(0.5)
    w = f"({p}) * ({one} - ({p}))"
    return {
        "gs": f"cast(floor((({p}) - y) * s * {q} + {half}) as bigint)",
        "gb": f"cast(floor((({p}) - y) * {q} + {half}) as bigint)",
        "hss": f"cast(floor(({w}) * s * s * {q} + {half}) as bigint)",
        "hsb": f"cast(floor(({w}) * s * {q} + {half}) as bigint)",
        "hbb": f"cast(floor(({w}) * {q} + {half}) as bigint)",
    }


def platt_features(docs: DataFrame) -> DataFrame:
    """(doc_id, s, y): the 1e-6-quantized docs_quality score and the
    docs_lang_id English-gate label — the two independent signals the
    calibration relates."""
    qs = lt.quality_score("text")
    return docs.select(
        "doc_id",
        qs["quality_score"].alias("s"),
        (lt.lang_pred("text") == "en").cast("int").alias("y"),
    )


def newton_step(
    a: float, b: float, sums: dict[str, int]
) -> tuple[float, float]:
    """One exact 2x2 Newton update from the integer sums. The solve
    runs in EXACT integer arithmetic (dets ~1e18 exceed double's
    2^53); only the final division floats — mirroring the oracle's
    HUGEINT arithmetic bit-for-bit."""
    if any(sums.get(k) is None for k in ("gs", "gb", "hss", "hsb", "hbb")):
        raise ValueError(
            "train_platt: NULL Newton sums — the feature frame is "
            "empty (aggregating zero rows yields NULL); fit needs at "
            "least one labelled row"
        )
    gs, gb = sums["gs"], sums["gb"]
    hss, hsb, hbb = sums["hss"], sums["hsb"], sums["hbb"]
    det = hss * hbb - hsb * hsb
    if det == 0:
        raise ValueError(
            "train_platt: singular Hessian (det == 0) — degenerate "
            "input (constant quantized score s, or a single distinct "
            "row); Platt scaling needs score variance to fit a slope"
        )
    da = float(hbb * gs - hsb * gb) / float(det)
    db = float(hss * gb - hsb * gs) / float(det)
    a2 = math.floor((a - da) * _Q + 0.5) / _Q
    b2 = math.floor((b - db) * _Q + 0.5) / _Q
    return a2, b2


def train_platt(
    feats: DataFrame, iters: int = PLATT_ITERS
) -> tuple[float, float]:
    """Newton-fit (a, b) of p = sigmoid(a*s + b): per iteration one
    scan + one 5-integer aggregation; parameters are driver metadata,
    re-quantized to 1e-6 so they re-enter as exact plan literals."""
    a, b = 0.0, 0.0
    for _ in range(iters):
        exprs = newton_sum_exprs(spark_lit(a), spark_lit(b), spark_lit)
        row = (
            feats.selectExpr(
                *[f"{e} as {k}" for k, e in exprs.items()]
            )
            .groupBy()
            .agg(*[F.sum(k).alias(k) for k in exprs])
            .first()
        )
        # pass raw values through newton_step's None guard BEFORE the
        # int() coercion: an empty feature frame aggregates to NULL
        # sums, and int(None) would raise a bare TypeError here,
        # bypassing the named guard (r14 ADVICE)
        sums = {k: row[k] for k in exprs}
        if not any(v is None for v in sums.values()):
            sums = {k: int(v) for k, v in sums.items()}
        a, b = newton_step(a, b, sums)
    return a, b


def score_platt(feats: DataFrame, a: float, b: float) -> DataFrame:
    """(doc_id, s, label, prob, pred): calibrated probability under
    the trained literal parameters — a pure projection."""
    p = p_expr(spark_lit(a), spark_lit(b), spark_lit)
    return feats.selectExpr(
        "doc_id", "s", "y as label", f"{p} as prob"
    ).withColumn("pred", (F.col("prob") >= 0.5).cast("int"))


def quality_platt(docs: DataFrame) -> DataFrame:
    """Train + score in one call (the registered query's body)."""
    feats = platt_features(docs)
    a, b = train_platt(feats)
    return score_platt(feats, a, b)
