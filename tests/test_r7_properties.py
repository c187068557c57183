"""Independent-reference checks for round-7 operators.

- CDC fold-invariance: applying a changelog through compact+merge over ANY
  partition of the rows into micro-batches must equal the global
  window-argmax — the property the streaming path relies on, checked here
  without a stream so hypothesis can drive the batch splits.
- OLS vs numpy: the integer-moment closed form must agree with
  numpy.polyfit (an entirely separate numeric path).
- Grid spatial join vs brute force on a boundary-heavy lattice: points
  sitting exactly on cell edges and exactly at the radius must come out
  identical to the cross-join reference.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.streaming.cdc import (
    _SNAPSHOT_SCHEMA,
    TOMBSTONE_EVENT,
    compact_changes,
    merge_snapshot,
)

_EPOCH = datetime.datetime(2024, 1, 1)

# small key/time spaces force collisions: same user updated in several
# batches, ties on ts resolved by event_id
_changelog = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # user_id
        st.sampled_from(["click", "view", TOMBSTONE_EVENT]),
        st.integers(min_value=0, max_value=5),          # ts minute
    ),
    min_size=1,
    max_size=10,
).map(
    lambda rows: [
        (u, et, float(i), _EPOCH + datetime.timedelta(minutes=m), i)
        for i, (u, et, m) in enumerate(rows)  # event_id = position (unique)
    ]
)
_splitter = st.lists(st.integers(min_value=0, max_value=2), min_size=10, max_size=10)


def _python_final_state(rows):
    best = {}
    for u, et, v, ts, eid in rows:
        if u not in best or (ts, eid) > (best[u][3], best[u][4]):
            best[u] = (u, et, v, ts, eid)
    return {
        (u, et, v, str(ts)) for (u, et, v, ts, eid) in best.values() if et != TOMBSTONE_EVENT
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=_changelog, split=_splitter)
def test_cdc_fold_invariant_under_any_batch_split(spark, rows, split):
    """Fold compact+merge over an arbitrary 3-way batch split of the
    changelog (batches NOT time-ordered) == global argmax minus
    tombstoned keys."""
    batches = [[], [], []]
    for i, row in enumerate(rows):
        batches[split[i % len(split)]].append(row)
    schema = "user_id long, event_type string, value double, ts timestamp, event_id long"
    state = spark.createDataFrame([], _SNAPSHOT_SCHEMA)
    for b in batches:
        if not b:
            continue
        state = merge_snapshot(state, compact_changes(spark.createDataFrame(b, schema)))
        # materialize each fold step so the lineage doesn't stack
        state = spark.createDataFrame(state.collect(), _SNAPSHOT_SCHEMA)
    got = {
        (r["user_id"], r["event_type"], r["value"], str(r["ts"]))
        for r in state.where(F.col("op") != "D").collect()
    }
    assert got == _python_final_state(rows)


def test_ols_matches_numpy(spark):
    import numpy as np

    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {r["grp"]: r for r in query_map()["ml_ols_fit"](spark, sf).collect()}
    li = (
        load_table(spark, sf, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("x"),
            F.round("l_extendedprice").cast("long").alias("y"),
        )
        .collect()
    )
    by_grp: dict[str, list] = {}
    for r in li:
        by_grp.setdefault(r["l_returnflag"], []).append((r["x"], r["y"]))
    for grp, pts in by_grp.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        assert abs(got[grp]["slope"] - slope) < 1e-4 * max(1, abs(slope))
        assert abs(got[grp]["intercept"] - intercept) < 1e-3 * max(1, abs(intercept))
        assert abs(got[grp]["r2"] - r * r) < 1e-4
        assert got[grp]["n"] == len(pts)


def test_grid_join_boundary_lattice_equals_brute(spark):
    """Points on exact cell edges and at near-radius separations: the
    cell-bucketed join must equal the brute-force cross join."""
    from data_wrangle_openstreetmaps_data_1_spark.functions.geo import haversine_km
    from data_wrangle_openstreetmaps_data_1_spark.operators.geo_queries import (
        grid_spatial_join,
    )

    cell = 0.1
    # lattice points exactly ON cell boundaries plus slight offsets
    pts_a = [
        (i * 10 + j, 47.0 + i * cell, -117.0 + j * cell) for i in range(4) for j in range(4)
    ]
    # b points sit near the TOP edge of their cell: within the 5 km radius
    # of the NEXT lattice a-point, i.e. matches must cross cell boundaries
    pts_b = [
        (i * 10 + j, 47.0 + i * cell + 0.09, -117.0 + j * cell + 0.098)
        for i in range(4)
        for j in range(4)
    ]
    a = spark.createDataFrame(pts_a, "id_a long, lat double, lon double")
    b = spark.createDataFrame(pts_b, "id_b long, lat double, lon double")
    got = {
        (r["id_a"], r["id_b"], r["dist_km"])
        for r in grid_spatial_join(a, b, radius_km=5.0, cell_deg=cell).collect()
    }
    aa = a.select(F.col("id_a"), F.col("lat").alias("lat_a"), F.col("lon").alias("lon_a"))
    bb = b.select(F.col("id_b"), F.col("lat").alias("lat_b"), F.col("lon").alias("lon_b"))
    dist = haversine_km(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    want = {
        (r["id_a"], r["id_b"], r["dist_km"])
        for r in aa.crossJoin(bb)
        .where(dist <= 5.0)
        .select("id_a", "id_b", F.round(dist, 3).alias("dist_km"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_grid_join_raises_when_cell_cannot_cover_radius(spark):
    import pytest

    from data_wrangle_openstreetmaps_data_1_spark.operators.geo_queries import (
        grid_spatial_join,
    )

    a = spark.createDataFrame([(1, 47.0, -117.0)], "id_a long, lat double, lon double")
    b = spark.createDataFrame([(2, 47.0, -117.0)], "id_b long, lat double, lon double")
    with pytest.raises(ValueError):
        grid_spatial_join(a, b, radius_km=50.0, cell_deg=0.1)


def test_event_pattern_skew_guard(spark):
    """The count-only pre-pass raises BEFORE any history string can
    materialize when one key's event count exceeds the cap, and stays
    silent otherwise (plans/pipeline_ext.py:_guard_max_events_per_key)."""
    import pytest

    from data_wrangle_openstreetmaps_data_1_spark.plans.pipeline_ext import (
        _guard_max_events_per_key,
    )

    df = spark.createDataFrame(
        [(1, i) for i in range(6)] + [(2, 0)], "user_id long, event_id long"
    )
    with pytest.raises(ValueError, match="skew guard.*user_id=1.*6 events"):
        _guard_max_events_per_key(df, "user_id", cap=5)
    _guard_max_events_per_key(df, "user_id", cap=6)  # at the cap: fine


def test_grid_join_antimeridian_wrap(spark):
    """Points 0.04° apart across ±180°: missed without wrap_lon (cells
    -1800 and 1799 are not neighbors), found with it (ring indices n-1 and
    0 are); wrap with a non-dividing cell_deg must raise, not under-match."""
    import pytest

    from data_wrangle_openstreetmaps_data_1_spark.operators.geo_queries import (
        grid_spatial_join,
    )

    a = spark.createDataFrame([(1, 10.0, 179.98)], "id_a long, lat double, lon double")
    b = spark.createDataFrame([(2, 10.0, -179.98)], "id_b long, lat double, lon double")
    assert grid_spatial_join(a, b, radius_km=5.0, cell_deg=0.1).count() == 0
    got = grid_spatial_join(a, b, radius_km=5.0, cell_deg=0.1, wrap_lon=True).collect()
    assert len(got) == 1 and got[0]["dist_km"] < 5.0
    # same-side pairs unaffected by wrap mode
    b2 = spark.createDataFrame([(3, 10.0, 179.95)], "id_b long, lat double, lon double")
    assert grid_spatial_join(a, b2, radius_km=5.0, cell_deg=0.1, wrap_lon=True).count() == 1
    with pytest.raises(ValueError, match="divide 360 exactly"):
        grid_spatial_join(a, b, radius_km=5.0, cell_deg=0.13, wrap_lon=True)
