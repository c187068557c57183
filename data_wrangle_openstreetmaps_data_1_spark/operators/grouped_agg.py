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
    each end of the sorted multiset (10% trim).

    The final division truncates toward zero (exact integer arithmetic,
    no float detour) — Python's ``//`` floors toward -inf, which for a
    negative group sum diverges by 1 from the Spark/DuckDB integral-div
    convention this module's parity contract promises."""
    s = v.sort_values(kind="stable", ignore_index=True)
    k = len(s) // 10
    kept = s.iloc[k : len(s) - k]
    total, cnt = int(kept.sum()), len(kept)
    return total // cnt if total >= 0 else -((-total) // cnt)


@pandas_udf("long")
def trimmed_count_10pct(v: pd.Series) -> int:
    """How many values survive the 10% trim (n - 2*floor(n/10))."""
    return len(v) - 2 * (len(v) // 10)


def lis_per_group(df, group_col: str, order_cols: list[str], value_col: str):
    """Per-group longest STRICTLY increasing subsequence length — the
    canonical genuinely-imperative per-group algorithm (patience sorting,
    O(n log n)), run via batch ``applyInPandas`` (grouped map): each
    group's rows arrive as one ordered pandas frame, Python computes what
    no algebraic aggregate can, one summary row returns per group.

    Output: (group, n_events, lis_len). Value-checked against a
    recursive-CTE DP oracle (quadratic, fine at oracle scale) — the
    UDF surface stays inside the correctness gate even for imperative
    logic.

    Scale note: like every grouped map, a group materializes on one
    executor — right for bounded per-entity series; shard the series
    first if a single group can exceed executor memory.
    """
    from bisect import bisect_left

    out_schema = f"{group_col} long, n_events long, lis_len long"

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="stable", ignore_index=True)
        tails: list = []
        for v in pdf[value_col]:
            i = bisect_left(tails, v)
            if i == len(tails):
                tails.append(v)
            else:
                tails[i] = v
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "n_events": [len(pdf)],
             "lis_len": [len(tails)]}
        )

    return df.groupBy(group_col).applyInPandas(one_group, schema=out_schema)
