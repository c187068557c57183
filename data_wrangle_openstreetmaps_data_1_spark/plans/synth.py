"""Shared synthetic-value generators for the query registry.

Single source of truth for every literal that appears in BOTH a Spark plan
and its DuckDB oracle (registry.py's determinism rule): dirty street names,
synthetic lat/lon points. Each generator has a SQL-string form and a Column
form parameterized on the key column, so the two can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sq(s: str) -> str:
    """Escape a literal for embedding in a single-quoted SQL string."""
    return s.replace("'", "''")


# Dirty street synthesis (feeds F1/A8): every suffix class the reference's
# mapping covers plus the bare-name one-off 'Arthur'.
STREET_BASES = ["North Lincoln", "South Maple", "East Sprague", "West Mission", "Main"]
STREET_SUFFIXES = ["Street", "St", "St.", "Ave", "Rd.", "Blvd", "Drive"]


def street_synth_sql(key: str) -> str:
    bases = ",".join(f"'{sq(b)}'" for b in STREET_BASES)
    sufs = ",".join(f"'{sq(s)}'" for s in STREET_SUFFIXES)
    return f"""
        CASE WHEN {key} % 8 = 7 THEN 'Arthur'
        ELSE ([{bases}])[{key} % {len(STREET_BASES)} + 1]
             || ' ' ||
             ([{sufs}])[{key} % {len(STREET_SUFFIXES)} + 1]
        END
"""


def street_synth_spark(key: str) -> Column:
    bases = F.array(*[F.lit(x) for x in STREET_BASES])
    sufs = F.array(*[F.lit(x) for x in STREET_SUFFIXES])
    k = F.col(key)
    return F.when(k % 8 == 7, F.lit("Arthur")).otherwise(
        F.concat(
            F.element_at(bases, (k % len(STREET_BASES) + 1).cast("int")),
            F.lit(" "),
            F.element_at(sufs, (k % len(STREET_SUFFIXES) + 1).cast("int")),
        )
    )


# Synthetic points in the reference bbox (feeds G3/G4/F6): deterministic
# lat/lon derived from a key, straddling the WA/ID dividing longitude.
POINT_LAT_BASE, POINT_LAT_STEP = 47.5580, 0.00033
POINT_LON_BASE, POINT_LON_STEP = -117.5523, 0.00093


def point_lat_sql(key: str) -> str:
    return f"{POINT_LAT_BASE} + ({key} % 1000) * {POINT_LAT_STEP}"


def point_lon_sql(key: str) -> str:
    return f"{POINT_LON_BASE} + (({key} * 7) % 1000) * {POINT_LON_STEP}"


def point_lat_spark(key: str) -> Column:
    return F.lit(POINT_LAT_BASE) + (F.col(key) % 1000) * F.lit(POINT_LAT_STEP)


def point_lon_spark(key: str) -> Column:
    return F.lit(POINT_LON_BASE) + ((F.col(key) * 7) % 1000) * F.lit(POINT_LON_STEP)
