"""Round-9 property tests: the ADVICE-r8 geo guard fixes.

1. The lon-axis cover guard is exact scalar haversine — the wide-cell
   counterexample the old 0.5%-margin linear form accepted (cell 30° at
   lat 60° with a ~1650 km radius, true min lon span ~1643 km) must now
   raise, while a radius inside the true span must still pass.
2. In wrap_lon mode the B-side lon cell goes through the same
   sign-normalizing wrap as the A-side neighbor explode, so dirty lons
   outside [-180, 180] (360-based data) still match instead of landing on
   a negative cell index that never equals any normalized A key.
"""

import math

import pytest

from data_wrangle_openstreetmaps_data_1_spark.functions.geo import EARTH_RADIUS_KM
from data_wrangle_openstreetmaps_data_1_spark.operators.geo_queries import (
    grid_spatial_join,
)


def _min_lon_span_km(lat_deg: float, cell_deg: float) -> float:
    a = math.cos(math.radians(lat_deg)) ** 2 * math.sin(
        math.radians(cell_deg) / 2.0
    ) ** 2
    return 2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_grid_join_lon_guard_is_exact_haversine(spark):
    a = spark.createDataFrame([(1, 0.0, 0.0)], "id_a long, lat double, lon double")
    b = spark.createDataFrame([(2, 0.0, 0.0)], "id_b long, lat double, lon double")
    span = _min_lon_span_km(60.0, 30.0)  # ~1643 km — below linear·cos ~1659
    assert span < 30.0 * math.cos(math.radians(60.0)) * math.pi * EARTH_RADIUS_KM / 180.0
    # ADVICE-r8 counterexample: the old margin guard passed radius up to
    # ~1659·0.995 km; any radius above the TRUE span must now raise.
    with pytest.raises(ValueError, match="min lon span"):
        grid_spatial_join(
            a, b, radius_km=span + 1.0, cell_deg=30.0, max_abs_lat=60.0
        ).count()
    # and a radius inside the true span still passes the guard
    assert (
        grid_spatial_join(
            a, b, radius_km=span - 1.0, cell_deg=30.0, max_abs_lat=60.0
        ).count()
        == 1
    )


def test_grid_join_wrap_mode_normalizes_dirty_lons(spark):
    """lon = -190 ≡ 170 and lon = 350 ≡ -10: both sides must land on the
    canonical ring cell in wrap mode (bare `%` would keep the sign and
    silently never match — ADVICE r8)."""
    a = spark.createDataFrame(
        [(1, 10.0, 169.98), (2, 10.0, -9.98)], "id_a long, lat double, lon double"
    )
    b = spark.createDataFrame(
        [(10, 10.0, -190.02), (20, 10.0, 350.02)],  # ≡ 169.98° / -9.98°
        "id_b long, lat double, lon double",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in grid_spatial_join(
            a, b, radius_km=5.0, cell_deg=0.1, wrap_lon=True
        ).collect()
    }
    assert got == {(1, 10), (2, 20)}


def test_truncate_lineage_reliable_mode(spark, tmp_path):
    """The ADVICE-r8 fix: with the reliable flag set, every lineage-
    truncation site uses HDFS-style checkpoint() against the configured
    dir (here: a local tmp dir standing in for durable shared storage);
    without a checkpoint dir the error is immediate and named, not the
    JVM's late one. Results must be identical in both modes."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.components import (
        connected_components,
    )
    from data_wrangle_openstreetmaps_data_1_spark.partitioning import (
        RELIABLE_CHECKPOINT_CONF,
        truncate_lineage,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 6)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    want = {
        (r["id"], r["component"])
        for r in connected_components(nodes, edges).collect()
    }

    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "true")
    try:
        import pytest

        # no checkpoint dir: loud, immediate, named error
        if spark.sparkContext.getCheckpointDir() is None:
            with pytest.raises(ValueError, match="setCheckpointDir"):
                truncate_lineage(edges)
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        got = {
            (r["id"], r["component"])
            for r in connected_components(nodes, edges).collect()
        }
        assert got == want
        # the reliable checkpoint actually wrote to the durable dir
        import os

        ckpt_files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(str(tmp_path / "ckpt"))
            for f in fs
        ]
        assert ckpt_files, "reliable mode did not write checkpoint files"
    finally:
        spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")


def test_near_bbox_correct_at_high_latitude(spark):
    """Review-r9 fix: bbox_prefilter's lon half-width is per-center exact
    (band-min cos), so a high-latitude center no longer silently drops
    in-radius points the old fixed cos(60°) divisor excluded."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.geo_queries import near

    # center at lat 70; point ~12.5 km due east: lon offset 0.33° is inside
    # the 10-mile radius but OUTSIDE the old fixed-divisor box (0.29°)
    centers = spark.createDataFrame(
        [("arctic", 70.0, 20.0)], "name string, lat double, lon double"
    )
    points = spark.createDataFrame(
        [(1, 70.0, 20.33), (2, 70.0, 21.0)], "id long, lat double, lon double"
    )
    got = {r["id"]: r["dist_km"] for r in near(points, centers, radius_miles=10.0).collect()}
    assert 1 in got and got[1] < 16.1  # recovered point
    assert 2 not in got  # ~38 km away: still excluded by the exact check
