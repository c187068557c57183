"""GROUPED_AGG pandas UDFs — the Arrow aggregate-UDF surface.

Each group's values arrive as ONE Arrow-backed pandas Series; one scalar
returns per group. Used where the aggregate has no composable built-in
form (a trimmed mean needs the group's sorted multiset, which no
algebraic accumulator provides).

NOTE: ``pandas`` must be imported at MODULE level here — pyspark's
GROUPED_AGG type inference resolves the (PEP 563 stringified) annotations
against the defining module's globals, so a function-local ``import
pandas as pd`` makes the hint unresolvable (UNSUPPORTED_SIGNATURE).

Scale note: a GROUPED_AGG UDF materializes each group in one executor's
memory (no partial aggregation) — correct for bounded groups (per-language
stats, per-entity series); for unbounded groups prefer an algebraic
rewrite or the histogram-sketch quantile path (operators/sketches.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def trimmed_mean_10pct(v: pd.Series) -> int:
    """Integer mean of the group's values after dropping floor(n/10) from
    each end of the sorted multiset (10% trim)."""
    s = v.sort_values(kind="stable", ignore_index=True)
    k = len(s) // 10
    kept = s.iloc[k : len(s) - k]
    return int(kept.sum()) // len(kept)


@pandas_udf("long")
def trimmed_count_10pct(v: pd.Series) -> int:
    """How many values survive the 10% trim (n - 2*floor(n/10))."""
    return len(v) - 2 * (len(v) // 10)
