"""Geospatial cell-blocked joins.

Split from the original monolithic queries.py (r5 verdict task 5);
registration side effects populate the shared REGISTRY, and the
package __init__ fixes the driver-window order, so module
membership is organization only — zero semantic change.
"""
# ruff: noqa: F403, F405
from __future__ import annotations
from kafka_streams_homework_spark.queries._shared import *  # noqa



_GEO_CUST_CTE = """
        c AS (
            SELECT c_custkey,
                   (('0x' || substr(md5('cust-lat:' || c_custkey::VARCHAR),
                                    1, 8))::BIGINT
                    / 4294967296.0) * 180 - 90 AS lat,
                   (('0x' || substr(md5('cust-lon:' || c_custkey::VARCHAR),
                                    1, 8))::BIGINT
                    / 4294967296.0) * 360 - 180 AS lon
            FROM customer
        )"""

_GEO_SUPP_CTE = """
        s AS (
            SELECT s_suppkey,
                   (('0x' || substr(md5('supp-lat:' || s_suppkey::VARCHAR),
                                    1, 8))::BIGINT
                    / 4294967296.0) * 180 - 90 AS lat,
                   (('0x' || substr(md5('supp-lon:' || s_suppkey::VARCHAR),
                                    1, 8))::BIGINT
                    / 4294967296.0) * 360 - 180 AS lon
            FROM supplier
        )"""


@register(
    "geo_radius_join",
    oracle=f"""
        WITH {_GEO_CUST_CTE}, {_GEO_SUPP_CTE}
        SELECT c.c_custkey, s.s_suppkey,
               round((c.lat - s.lat) * (c.lat - s.lat)
                     + (c.lon - s.lon) * (c.lon - s.lon) + 1e-9, 6)
                   AS dist2_deg
        FROM c, s
        WHERE (c.lat - s.lat) * (c.lat - s.lat)
              + (c.lon - s.lon) * (c.lon - s.lon)
              <= {GEO.RADIUS_DEG * GEO.RADIUS_DEG}
    """,
    description="Spatial radius join: every (customer, supplier) pair "
    "within 5 planar degrees. Coordinates are md5-fraction synthesized "
    "(bit-identical doubles both engines — div by 2^32 is exact "
    "IEEE); the engine NEVER goes O(n*m): points land in 5.625-degree "
    "grid cells cut from the hash's high bits (integer shifts), the "
    "small side explodes to its 3x3 cell neighborhood, candidates come "
    "from one cell-key equi-join, the exact squared-distance filter "
    "is JVM multiplication only (no libm). The oracle brute-forces "
    "the cross product, proving the cell cover is lossless. Planar "
    "metric by construction; haversine + lon wrap swap in at the "
    "documented points (operators/geo.py) with the same plan shape",
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = GEO.synth_coords(_t(spark, sf_dir, "customer"), "c_custkey", "cust")
    supp = GEO.synth_coords(_t(spark, sf_dir, "supplier"), "s_suppkey", "supp")
    return GEO.radius_join(cust, supp, "c_custkey", "s_suppkey")


@register(
    "geo_nearest_supplier",
    oracle=f"""
        WITH {_GEO_CUST_CTE}, {_GEO_SUPP_CTE},
        d AS (
            SELECT c.c_custkey, s.s_suppkey,
                   (c.lat - s.lat) * (c.lat - s.lat)
                   + (c.lon - s.lon) * (c.lon - s.lon) AS d2
            FROM c, s
        ), r AS (
            SELECT c_custkey, s_suppkey, d2,
                   row_number() OVER (PARTITION BY c_custkey
                                      ORDER BY d2, s_suppkey) AS rk
            FROM d
        )
        SELECT c_custkey, s_suppkey,
               round(sqrt(d2) + 1e-9, 6) AS dist_deg
        FROM r WHERE rk = 1
    """,
    description="Spatial nearest-neighbor against a bounded dimension: "
    "per customer the closest supplier, deliberately the broadcast "
    "brute-force plan — the dimension is small, so broadcast + one "
    "map-side argmin (row_number over (d2, key), ties key-broken) "
    "beats any index at every scale; the big side never shuffles "
    "except the per-key argmin partial. Distances on md5-fraction "
    "coordinates (bit-identical doubles); sqrt is IEEE "
    "correctly-rounded so the final rounded value is engine-exact",
)
def q_geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = GEO.synth_coords(_t(spark, sf_dir, "customer"), "c_custkey", "cust")
    supp = GEO.synth_coords(_t(spark, sf_dir, "supplier"), "s_suppkey", "supp")
    return GEO.nearest_neighbor(cust, supp, "c_custkey", "s_suppkey")


@register(
    "geo_nearest_supplier_cells",
    oracle=f"""
        WITH {_GEO_CUST_CTE}, {_GEO_SUPP_CTE},
        d AS (
            SELECT c.c_custkey, s.s_suppkey,
                   (c.lat - s.lat) * (c.lat - s.lat)
                   + (c.lon - s.lon) * (c.lon - s.lon) AS d2
            FROM c, s
        ), r AS (
            SELECT c_custkey, s_suppkey, d2,
                   row_number() OVER (PARTITION BY c_custkey
                                      ORDER BY d2, s_suppkey) AS rk
            FROM d
        )
        SELECT c_custkey, s_suppkey,
               round(sqrt(d2) + 1e-9, 6) AS dist_deg
        FROM r WHERE rk = 1
    """,
    description="geo_nearest_supplier with the 100 TB plan: EXACT "
    "cell-blocked nearest neighbor — right side explodes to its 5x5 "
    "neighbor cells and broadcast-equi-joins the big side (candidates "
    "scale with local density, not |suppliers|), argmin is a "
    "partial-aggregable min(struct(d2, key)) groupBy (map-side "
    "combine, no window sort), and a geometric gate (d < 2 cell "
    "edges, STRICT) proves each candidate globally optimal; the rare "
    "gate-failing/sparse rows take the brute-force leg, so the result "
    "is bit-identical to the broadcast argmin (same oracle SQL). "
    "25s -> ~1s at sf0.1 dimension sizes",
)
def q_geo_nearest_supplier_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = GEO.synth_coords(_t(spark, sf_dir, "customer"), "c_custkey", "cust")
    supp = GEO.synth_coords(_t(spark, sf_dir, "supplier"), "s_suppkey", "supp")
    return GEO.nearest_neighbor_cells(cust, supp, "c_custkey", "s_suppkey")
