"""G2 replacement: the z-order write layout must physically localize
lat/lon so parquet min/max statistics become selective (the engine's
substitute for MongoDB's 2dsphere index)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.functions.geo import write_geo_layout, zorder_key_sql


def _file_stats(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_zorder_key_orders_neighbors_together(spark):
    df = spark.createDataFrame(
        [(47.0, -117.0), (47.0001, -117.0001), (12.0, 30.0)], "lat double, lon double"
    )
    keys = [r[0] for r in df.select(F.expr(zorder_key_sql("lat", "lon"))).collect()]
    assert abs(keys[0] - keys[1]) < abs(keys[0] - keys[2])


def test_geo_layout_localizes_file_stats(spark, tmp_path):
    # 20k synthetic points across the reference bbox
    pts = spark.range(20000).select(
        (F.lit(47.5580) + (F.col("id") % 1000) / 1000.0 * F.lit(0.3298)).alias("lat"),
        (F.lit(-117.5523) + ((F.col("id") * 7) % 1000) / 1000.0 * F.lit(0.9311)).alias("lon"),
        F.col("id"),
    )
    out = str(tmp_path / "geo")
    write_geo_layout(pts, out, num_files=8)

    lat_stats = _file_stats(out, "lat")
    lon_stats = _file_stats(out, "lon")
    assert len(lat_stats) >= 4

    global_lat = max(mx for _, mx in lat_stats) - min(mn for mn, _ in lat_stats)
    global_lon = max(mx for _, mx in lon_stats) - min(mn for mn, _ in lon_stats)
    mean_lat_range = sum(mx - mn for mn, mx in lat_stats) / len(lat_stats)
    mean_lon_range = sum(mx - mn for mn, mx in lon_stats) / len(lon_stats)

    # with a random layout every file would span ~the whole bbox in BOTH
    # dimensions; z-order must shrink the average footprint in both at once
    assert mean_lat_range < 0.6 * global_lat
    assert mean_lon_range < 0.6 * global_lon
