"""G4 general form: ray-cast point-in-polygon pandas_udf unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.functions.geo import point_in_polygon_udf

# unit square (lon, lat), open ring
SQUARE = [(0.0, 0.0), (1.0, 0.01), (1.0, 1.0), (0.01, 1.0)]
# concave "arrowhead"
CONCAVE = [(-1.0, -1.0), (1.0, -1.0), (0.0, 0.0), (1.0, 1.0), (-1.0, 1.0)]


def _classify(spark, ring, points):
    df = spark.createDataFrame(points, "lat double, lon double")
    pip = point_in_polygon_udf(ring)
    return [r["in"] for r in df.select(pip(F.col("lat"), F.col("lon")).alias("in")).collect()]


def test_square_membership(spark):
    got = _classify(
        spark,
        SQUARE,
        [(0.5, 0.5), (0.99, 0.5), (1.5, 0.5), (-0.1, 0.5), (0.5, 2.0)],
    )
    assert got == [True, True, False, False, False]


def test_concave_polygon(spark):
    # rings are (lon, lat); classify points given as (lat, lon).
    # the notch opens rightward from the tip at (0,0): a point right of the
    # tip at y=0 is OUTSIDE even though it is within the convex hull
    got = _classify(
        spark,
        CONCAVE,
        [(0.0, -0.5), (0.9, 0.0), (0.0, 0.5), (-1.5, 0.0)],
        # left lobe ^   upper ^    in notch ^    below ^
    )
    assert got == [True, True, False, False]


def test_closed_ring_equals_open_ring(spark):
    closed = [*SQUARE, SQUARE[0]]
    pts = [(0.5, 0.5), (1.5, 0.5)]
    assert _classify(spark, SQUARE, pts) == _classify(spark, closed, pts)
