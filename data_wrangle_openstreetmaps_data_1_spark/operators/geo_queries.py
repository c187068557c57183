"""Geospatial query operators (SURVEY.md §2.9, §2.3 J1/J2).

- ``near``: the reference's ``$near`` + ``$maxDistance`` (readme.md:389-398)
  generalized to many centers: broadcast-join the (tiny) centers table
  against the big points table, bbox pre-filter (sargable, prunes parquet
  row groups) then exact haversine, distance-sorted (O3: ``$near`` results
  are implicitly distance-ordered — made explicit here).
- ``box_counts``: the WA/ID ``$geoWithin`` polygon counts (readme.md:500-539)
  as ONE single-pass groupBy instead of the reference's per-(group, box)
  re-scan loop (A9 rewrite, SURVEY §2.4).
- ``reconstruct_rings``: the relation->way->node polygon reconstruction the
  reference describes but never built (readme.md:488-495, J2) — order-
  preserving dereference joins.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .topk import topk_per_key
from pyspark.sql.window import Window

from ..partitioning import truncate_lineage

from ..functions.geo import (
    DIVIDING_LON,
    EARTH_RADIUS_KM,
    MILES_TO_METERS,
    bbox_prefilter,
    haversine_km,
)


def near(points: DataFrame, centers: DataFrame, lat_col: str = "lat", lon_col: str = "lon", radius_miles: float = 10.0) -> DataFrame:
    """All (center, point) pairs within ``radius_miles``, with distance.

    ``centers`` needs columns ``name``/``lat``/``lon`` and must be small
    (broadcast). Output adds ``center_name`` + ``dist_km`` (rounded 3);
    callers sort by distance to preserve the reference's ``$near`` ordering.
    """
    radius_km = radius_miles * MILES_TO_METERS / 1000.0
    c = F.broadcast(
        centers.select(
            F.col("name").alias("center_name"),
            F.col("lat").alias("c_lat"),
            F.col("lon").alias("c_lon"),
        )
    )
    dist = haversine_km(F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"))
    bbox = bbox_prefilter(
        F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"), radius_km
    )
    return (
        points.crossJoin(c)
        .where(bbox)
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= radius_km)
        .withColumn("dist_km", F.round("dist_km", 3))
        .drop("c_lat", "c_lon")
    )


def state_of(lon: Column, dividing_lon: float = DIVIDING_LON) -> Column:
    """WA west of the dividing longitude, ID east (readme.md:500)."""
    return F.when(lon < dividing_lon, F.lit("WA")).otherwise(F.lit("ID"))


def box_counts(points: DataFrame, lon_col: str = "lon", group_col: str | None = None) -> DataFrame:
    """Single-pass per-state (x optional group) counts — replaces the
    reference's O(groups x boxes) re-scan loop (readme.md:532-539)."""
    with_state = points.withColumn("state", state_of(F.col(lon_col)))
    keys = ["state"] + ([group_col] if group_col else [])
    return with_state.groupBy(*keys).agg(F.count("*").alias("cnt"))


def reconstruct_rings(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J2: dereference each way's ordered ``node_refs`` into an ordered
    coordinate ring (readme.md:488-495 — described, never implemented).

    ``ways``: (id, node_refs array<string>); ``nodes``: (id, lat, lon).
    ``posexplode`` keeps the ordinal so the join can restore order — the
    exact concern the reference flags ("order maintained").

    Scale notes: two shuffles (join on node id, regroup by way id) — both
    equi-hash; sort_merge at scale; no driver materialization.
    """
    edges = ways.select(F.col("id").alias("way_id"), F.posexplode("node_refs").alias("ord", "node_id"))
    joined = edges.join(
        nodes.select(F.col("id").alias("node_id"), "lat", "lon"), "node_id", "left"
    )
    return (
        joined.groupBy("way_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "lon", "lat"))),
                lambda s: F.array(s["lon"], s["lat"]),
            ).alias("ring")
        )
    )


def grid_spatial_join(
    a: DataFrame,
    b: DataFrame,
    radius_km: float,
    cell_deg: float,
    max_abs_lat: float = 60.0,
    wrap_lon: bool = False,
) -> DataFrame:
    """Big×big radius join without a cross product: cell-bucketed candidates.

    ``a`` carries (id_a, lat, lon), ``b`` carries (id_b, lat, lon). Both
    sides map each point to an integer (lat, lon) grid cell of
    ``cell_deg`` degrees; the A side additionally explodes to its 3×3
    neighborhood, so candidate pairs come from a plain hash EQUI-join on
    the cell key and the exact haversine refines them. Never all-pairs —
    this is the geohash-join shape (`near` covers the broadcast-small
    case; this operator is for two data-sized point sets).

    Correctness requires the cell to dominate the radius on both axes so a
    qualifying pair can differ by at most one cell index. Guards, both
    EXACT scalar math on the same sphere ``haversine_km`` measures on:

    - lat axis: the central angle between two points always satisfies
      θ >= |Δφ| (cosθ = sinφ₁sinφ₂ + cosφ₁cosφ₂cosΔλ <= cos(φ₁-φ₂)), so
      the linear meridian form ``cell_deg · π·R/180`` is the exact minimum
      distance across one skipped lat cell — no margin needed.
    - lon axis: for fixed Δλ the minimum distance over φ₁,φ₂ ∈ [-L, L] is
      attained at φ₁ = φ₂ = ±L (f(φ₂) = sinL·sinφ₂ + cosL·cosφ₂·cosΔλ is
      increasing on [-L, L]: its stationary point tanφ₂ = tanL/cosΔλ lies
      beyond L), so the guard requires
      ``haversine(L, 0, L, cell_deg) >= radius_km`` — exact, replacing the
      earlier linear·cos(L)·0.995 form whose fixed margin stopped covering
      the ~Δλ²-growing chord deficit for wide cells (ADVICE r8: cell 30°
      at lat 60° passed the old guard with a ~0.8% deficit).

    Callers with data beyond ±``max_abs_lat`` must widen the cell.

    Antimeridian: by default lon cells do NOT wrap at ±180° — cells
    straddling it are not neighbors. Pass ``wrap_lon=True`` for data that
    crosses it: lon cells are then indexed modulo the ring size
    360/cell_deg and the A side's neighbor explode wraps. Wrap requires
    cell_deg to divide 360 EXACTLY (else the seam cell is thinner than
    ``cell_deg`` and a radius could span two cell indices there — asserted
    here rather than silently under-matching).

    Scale: shuffle is keyed on the cell id; the A side grows 9× (ids +
    coords only — project before calling), B stays 1×. Each (a, b) pair
    meets exactly once because a B point lives in exactly one cell. Dense
    hot cells are a salting candidate like any skewed join key.
    """
    km_per_deg = math.pi * EARTH_RADIUS_KM / 180.0  # exact meridian arc
    # min distance across one lon cell at the worst latitude (docstring):
    # scalar haversine at φ₁=φ₂=max_abs_lat, Δλ=cell_deg.
    _phi = math.radians(max_abs_lat)
    _a = math.cos(_phi) ** 2 * math.sin(math.radians(cell_deg) / 2.0) ** 2
    min_lon_km = 2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(_a))
    if cell_deg * km_per_deg < radius_km or min_lon_km < radius_km:
        raise ValueError(
            f"cell_deg={cell_deg} too small for radius_km={radius_km} at "
            f"|lat|<={max_abs_lat}: neighbor cells would not cover the radius "
            f"(lat span {cell_deg * km_per_deg:.1f} km, min lon span "
            f"{min_lon_km:.1f} km)"
        )
    cell = lambda c: F.floor(c / F.lit(cell_deg)).cast("long")  # noqa: E731
    if wrap_lon:
        n_lon = 360.0 / cell_deg
        if abs(n_lon - round(n_lon)) > 1e-9 or round(n_lon) < 3:
            raise ValueError(
                f"wrap_lon requires cell_deg to divide 360 exactly into >= 3 "
                f"cells (got 360/{cell_deg} = {n_lon}): a thinner seam cell "
                "could let a radius span two cell indices"
            )
        n_lon = int(round(n_lon))
        wrap = lambda c: ((c % n_lon) + n_lon) % n_lon  # noqa: E731
        # lon ∈ [-180, 180] → ring index 0..n-1 (lon = +180 wraps to 0).
        # The raw index goes through the SAME sign-normalizing wrap as the
        # A-side neighbor explode: Spark's bare `% n` keeps the dividend's
        # sign, so a dirty lon outside [-180, 180] (e.g. 360-based data,
        # lon = -190) would otherwise yield a NEGATIVE b-side index that
        # can never equal a normalized 0..n-1 a-side key — the row would
        # silently never match instead of wrapping (ADVICE r8). With the
        # wrap, any finite lon lands on its correct ring cell (lon ≡
        # lon ± 360 maps to the same index).
        lon_cell = lambda c: wrap(  # noqa: E731
            F.floor((c + F.lit(180.0)) / F.lit(cell_deg)).cast("long")
        )
    else:
        lon_cell, wrap = cell, lambda c: c
    b2 = b.select(
        "id_b",
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        cell(F.col("lat")).alias("cell_lat"),
        lon_cell(F.col("lon")).alias("cell_lon"),
    )
    offsets = F.array(F.lit(-1), F.lit(0), F.lit(1))
    a2 = (
        a.select(
            "id_a",
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            cell(F.col("lat")).alias("base_lat"),
            lon_cell(F.col("lon")).alias("base_lon"),
        )
        .withColumn("cell_lat", F.explode(F.transform(offsets, lambda d: F.col("base_lat") + d)))
        .withColumn("cell_lon", F.explode(F.transform(offsets, lambda d: wrap(F.col("base_lon") + d))))
        .drop("base_lat", "base_lon")
    )
    dist = haversine_km(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    return (
        a2.join(b2, ["cell_lat", "cell_lon"])
        .where(dist <= F.lit(radius_km))
        .select("id_a", "id_b", F.round(dist, 3).alias("dist_km"))
    )


def grid_knn_join(
    a: DataFrame,
    b: DataFrame,
    k: int,
    cell_deg: float,
    max_abs_lat: float = 60.0,
    max_ring: int = 8,
) -> DataFrame:
    """k-nearest-neighbors join between two data-sized point sets — for
    EVERY ``a`` point, its ``k`` nearest ``b`` points by haversine — via
    the same integer-grid candidate scheme as :func:`grid_spatial_join`,
    made EXACT for kNN by certified ring escalation:

    Round r joins the still-unanswered points against their
    (2r+1)x(2r+1) cell ring. A point's top-k is CERTIFIED final iff it
    found >= k candidates AND its kth distance is <= the ring-r
    guarantee — the exact minimum distance to any point OUTSIDE the
    ring (r cell spans on some axis; lat span is the exact meridian
    arc, lon span the exact haversine at the worst latitude, the same
    scalar math as grid_spatial_join's guards). Nothing outside the ring
    can beat a certified top-k. Uncertified points continue with r
    doubled (1, 2, 4, ... max_ring); exhaustion raises loudly instead of
    returning unproven neighbors (a point with fewer than k ``b``
    anywhere reachable is the classic trigger).

    The escalation is what makes this scale: the common dense case pays
    one 9x-replicated equi-join (ids + coords only, per-pair met exactly
    once), and each wider ring re-joins ONLY the shrinking uncertified
    remainder — one driver-side count per round gates the loop, the data
    never collects. Antimeridian: lon cells do not wrap; normalize data
    crossing ±180° first (same documented limit as grid_spatial_join's
    default mode).

    Output: (id_a, id_b, dist_km, rk) with rk = 1..k ordered by
    (distance, id_b) — the deterministic tie-break shared with every
    top-k in this package.
    """
    km_per_deg = math.pi * EARTH_RADIUS_KM / 180.0
    _phi = math.radians(max_abs_lat)

    def guarantee_km(r: int) -> float:
        # exact min distance to anything outside the (2r+1)^2 ring: r full
        # cell spans on the lat axis (meridian arc) or the lon axis
        # (haversine at the worst latitude; sin(r*theta/2) < r*sin(theta/2),
        # so the exact form is computed per r, NOT r x the single-cell span)
        _aa = math.cos(_phi) ** 2 * math.sin(math.radians(r * cell_deg) / 2.0) ** 2
        min_lon = 2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(_aa))
        return min(r * cell_deg * km_per_deg, min_lon)

    # DATA guard, not just a parameter contract: the lon-axis guarantee is
    # computed at cos(max_abs_lat), and a point beyond that latitude makes
    # the true outside-ring minimum SMALLER than the guarantee — a top-k
    # could falsely certify and silently exclude a closer neighbor. Two
    # one-scalar aggs fail loudly instead (the radius join documents the
    # same obligation; a kNN join must enforce it because its error mode
    # is wrong answers, not missing pairs).
    for side, df_side in (("a", a), ("b", b)):
        mx = df_side.agg(F.max(F.abs(F.col("lat")))).collect()[0][0]
        if mx is not None and mx > max_abs_lat:
            raise ValueError(
                f"grid_knn_join: {side}-side |lat| {mx:.3f} exceeds "
                f"max_abs_lat={max_abs_lat}; raise max_abs_lat (widening "
                "the guarantee math) or filter the data"
            )
    cell = lambda c: F.floor(c / F.lit(cell_deg)).cast("long")  # noqa: E731
    b2 = b.select(
        "id_b",
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        cell(F.col("lat")).alias("cell_lat"),
        cell(F.col("lon")).alias("cell_lon"),
    )

    def ring_topk(a_pts: DataFrame, r: int) -> DataFrame:
        offs = F.array(*[F.lit(i) for i in range(-r, r + 1)])
        a2 = (
            a_pts.select(
                F.col("lat").alias("lat_a"),
                F.col("lon").alias("lon_a"),
                cell(F.col("lat")).alias("c_lat"),
                cell(F.col("lon")).alias("c_lon"),
            )
            .withColumn("dlat", F.explode(offs))
            .withColumn("dlon", F.explode(offs))
            .select(
                "lat_a",
                "lon_a",
                (F.col("c_lat") + F.col("dlat")).alias("cell_lat"),
                (F.col("c_lon") + F.col("dlon")).alias("cell_lon"),
            )
        )
        cand = a2.join(b2, ["cell_lat", "cell_lon"]).select(
            "lat_a",
            "lon_a",
            "id_b",
            haversine_km(
                F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
            ).alias("dist"),
        )
        # two-stage top-k (operators/topk.py): a dense city ring must not
        # funnel its whole candidate set through one reducer. The
        # certification inputs derive from the k-BOUNDED page alone:
        # n_top == k iff the ring held >= k candidates, and dk (the kth
        # distance) is the page's max — so the old corpus-wide
        # count/max window aggregates are gone entirely. The page is
        # materialized (k rows per position) BEFORE the gstats self-join:
        # without the barrier the exploded ring join and both ranking
        # stages replay once for gstats and again for t — the recompute
        # class every other iterative site here truncates away.
        t = truncate_lineage(
            topk_per_key(
                cand,
                ["lat_a", "lon_a"],
                [F.asc("dist"), F.asc("id_b")],
                k,
                "id_b",
                rank_col="rk",
            )
        )
        gstats = t.groupBy("lat_a", "lon_a").agg(
            F.count("*").alias("n_top"), F.max("dist").alias("dk")
        )
        return t.join(gstats, ["lat_a", "lon_a"])

    # kNN is a function of the COORDINATES, not the row: compute per
    # DISTINCT (lat, lon) and join ids back at the end. Real point data
    # repeats positions heavily (store locations, gazetteer snap points,
    # multiple records per address), and every repeated position would
    # otherwise re-pay its whole candidate neighborhood — the 10x
    # rehearsal measured 72x superlinear wall before this dedup (150k
    # rows on 1k distinct positions), 1.7x after. Unique-position data
    # pays one extra tiny shuffle. The (lat, lon) pair IS the working
    # key throughout (16-byte shuffle key, positions are distinct on it
    # by construction) — no hash surrogate, so a 64-bit collision can
    # never silently merge two positions' neighbor lists.
    positions = a.select(F.col("lat"), F.col("lon")).distinct()

    remaining = positions
    out = None
    r = 1
    while True:
        t = ring_topk(remaining, r)
        g = guarantee_km(r)
        # STRICT dk < g: an outside-ring point at exactly the guarantee
        # distance could win the (dist, id_b) tie-break; a kth distance
        # equal to the guarantee escalates one more ring instead
        certified = t.where((F.col("n_top") == k) & (F.col("dk") < g))
        # per-round lineage truncation: without it the final action and
        # every later round's gating count would re-execute ALL previous
        # rounds' exploded ring joins (the iterative-plan class
        # truncate_lineage exists for); certified rows are <= k x |remaining|
        part = truncate_lineage(
            certified.select(
                "lat_a", "lon_a", "id_b", F.round("dist", 3).alias("dist_km"), "rk"
            )
        )
        out = part if out is None else out.unionByName(part)
        # uncertified = short/far points in t, plus points whose ring held
        # no b at all (absent from t entirely)
        uncert_pos = (
            t.where((F.col("n_top") < k) | (F.col("dk") >= g))
            .select(F.col("lat_a").alias("lat"), F.col("lon_a").alias("lon"))
            .unionByName(
                remaining.join(
                    t.select(
                        F.col("lat_a").alias("lat"), F.col("lon_a").alias("lon")
                    ).distinct(),
                    ["lat", "lon"],
                    "left_anti",
                )
            )
            .distinct()
        )
        remaining = truncate_lineage(remaining.join(uncert_pos, ["lat", "lon"]))
        if remaining.limit(1).count() == 0:  # one scalar gates each round
            return out.join(
                a.select("id_a", F.col("lat").alias("lat_a"), F.col("lon").alias("lon_a")),
                ["lat_a", "lon_a"],
            ).select("id_a", "id_b", "dist_km", "rk")
        r *= 2
        if r > max_ring:
            c = remaining.limit(1).collect()[0]
            raise ValueError(
                f"grid_knn_join: position (lat={c['lat']}, lon={c['lon']}) "
                f"cannot certify its top-{k} within ring {max_ring} "
                f"(guarantee {guarantee_km(max_ring):.1f} km) — fewer than "
                f"{k} reachable neighbors or data too sparse for "
                f"cell_deg={cell_deg}; widen the cell or raise max_ring"
            )
