"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf, then compares row count, column names, and values
(order-insensitive; exact for non-floats, tiny-epsilon for floats — the
driver hashes values, so any float mismatch here is flagged loudly).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame, sort_cols: list[str]) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=sort_cols, ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    odf.columns = [next(c for c in sdf.columns if c.lower() == oc.lower()) for oc in odf.columns]
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    import pandas.api.types as pt

    # Dtype parity gate: the driver hashes VALUES, so int64 123 and float64
    # 123.0 are different hashes even when numerically equal. The classic
    # trigger is a DuckDB integer sum() (HUGEINT -> float64 via fetchdf())
    # against Spark's int64 — exactly the bug that shipped red twice before
    # this check existed. Fail hard; don't fall through to the value loop,
    # which would mask it by comparing float(a) == float(b).
    for col in sdf.columns:
        s_int, o_int = pt.is_integer_dtype(sdf[col]), pt.is_integer_dtype(odf[col])
        s_flt, o_flt = pt.is_float_dtype(sdf[col]), pt.is_float_dtype(odf[col])
        if (s_int and o_flt) or (s_flt and o_int):
            problems.append(
                f"DTYPE-PARITY col={col}: spark={sdf[col].dtype} vs "
                f"oracle={odf[col].dtype} — int vs float hashes differently in "
                f"the driver (CAST the oracle's integer sum() to BIGINT)"
            )
    if problems:
        return problems
    # ONE shared sort order for both frames, non-float columns first.
    # Floats last keeps sub-ulp cross-engine diffs from misaligning rows.
    sort_cols = sorted(
        sdf.columns,
        key=lambda c: (pt.is_float_dtype(sdf[c]) or pt.is_float_dtype(odf[c]), c),
    )
    s, o = canon(sdf, sort_cols), canon(odf, sort_cols)
    for col in s.columns:
        sv, ov = s[col], o[col]
        for i in range(len(sv)):
            a, b = sv.iloc[i], ov.iloc[i]
            a_null = a is None or (isinstance(a, float) and math.isnan(a)) or pd.isna(a)
            b_null = b is None or (isinstance(b, float) and math.isnan(b)) or pd.isna(b)
            if a_null and b_null:
                continue
            if a_null != b_null:
                problems.append(f"null mismatch col={col} row={i}: {a!r} vs {b!r}")
                break
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if fa != fb:
                    tag = "EXACT-FLOAT-MISMATCH" if abs(fa - fb) > 1e-9 * max(1, abs(fa)) else "float-ulp"
                    problems.append(f"{tag} col={col} row={i}: {fa!r} vs {fb!r}")
                    break
            elif str(a) != str(b):
                problems.append(f"value mismatch col={col} row={i}: {a!r} vs {b!r}")
                break
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("check_oracle")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duck_con(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # LSH operators persist() intermediates for their multi-branch plans;
        # release them between queries so the battery doesn't accumulate
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        spark_s = time.time() - t0
        t1 = time.time()
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        duck_s = time.time() - t1
        ratio = spark_s / duck_s if duck_s > 0.005 else float("nan")
        timing = f"spark {spark_s:.1f}s / duck {duck_s:.1f}s ({ratio:.1f}x)"
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name} ({len(sdf)} rows, {timing})")
            for p in problems[:5]:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, {timing})")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
