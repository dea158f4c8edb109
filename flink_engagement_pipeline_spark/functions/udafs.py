"""Custom vectorized aggregates (GROUPED_AGG pandas UDFs).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf infers the UDAF shape from real (non-string) type hints,
and stringified hints would force the deprecated explicit
PandasUDFType API.

Each group's values arrive as ONE Arrow-backed pandas Series (never
row-at-a-time Python); reductions happen in integer cents so results
are bit-identical to a decimal SQL oracle. Partial aggregation does
not apply to grouped-agg UDFs — state is one group's column, the
documented trade for arbitrary-Python aggregates.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def trimmed_mean_2dec(v: pd.Series) -> float:
    """Two-sided 10% trimmed mean of a 2-decimal measure, reduced in
    integer cents. Trimming by sorted rank keeps the same value
    multiset regardless of tie order, so the result is deterministic
    and oracle-exact.

    Cent conversion is sign-aware half-away-from-zero (the same
    convention as the SQL oracle's ``floor(x*100 + 0.5)`` and the
    window aggregation's cent rounding) — NOT numpy's half-even
    ``round``, which would diverge on any value sitting exactly on a
    half-cent."""
    s = v.sort_values()
    n = len(s)
    k = n // 10
    kept = s.iloc[k : n - k].to_numpy()
    cents = np.where(
        kept >= 0,
        np.floor(kept * 100.0 + 0.5),
        np.ceil(kept * 100.0 - 0.5),
    ).astype("int64")
    return float(cents.sum()) / (100.0 * len(cents))


@pandas_udf("long")
def trimmed_count(v: pd.Series) -> int:
    """Row count surviving the two-sided 10% trim."""
    n = len(v)
    return n - 2 * (n // 10)
