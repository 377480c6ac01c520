"""Geospatial operators: cell-blocked radius join + broadcast nearest.

The fixtures carry no coordinates, so both the engine and the DuckDB
oracle derive deterministic lat/lon from the md5-fraction idiom
(``conv(substr(md5(tag:key),1,8),16,10) / 2^32``): division by a power
of two is exact in IEEE-754 and the remaining ``*span - offset`` ops
are single correctly-rounded doubles, so the coordinates are
BIT-IDENTICAL across engines. Distances are planar degrees (squared
Euclidean — multiplication/addition only, no libm), which keeps every
comparison cross-engine exact; production swaps in haversine and a
longitude wrap at the marked points, the plan shape is unchanged.

Scale shape (the point of the exercise): a radius join never goes
O(n*m) — each point lands in a grid cell at least as wide as the
radius, the smaller side is exploded to its 3x3 cell neighborhood, and
candidates come from one equi-join on the (cx, cy) cell key before the
exact distance filter. Nearest-neighbor against a small dimension is
the broadcast brute-force plan on purpose: with |suppliers| bounded,
broadcast + argmin is one scan of the big side with no shuffle.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Cell grid: 64 lon cells (5.625 deg) x 32 lat cells (5.625 deg).
#: The radius must stay <= the cell edge so a 3x3 neighborhood covers
#: every in-radius candidate.
LON_SHIFT = 26
LAT_SHIFT = 27
RADIUS_DEG = 5.0


def _h32(tag: str, key: Column) -> Column:
    """Cross-engine uniform 32-bit integer from md5 (engine-portable)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(tag + ":"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def synth_coords(df: DataFrame, key_col: str, tag: str) -> DataFrame:
    """Attach deterministic (lat, lon) + integer cell ids to each row.

    lat = h/2^32 * 180 - 90, lon = h'/2^32 * 360 - 180; the cell ids
    come straight off the hash's high bits (pure integer shifts — no
    float boundary can disagree with the double coordinate because the
    cell is never derived FROM the double).
    """
    hlat = _h32(tag + "-lat", F.col(key_col))
    hlon = _h32(tag + "-lon", F.col(key_col))
    return df.select(
        key_col,
        (hlat / F.lit(4294967296.0) * 180 - 90).alias("lat"),
        (hlon / F.lit(4294967296.0) * 360 - 180).alias("lon"),
        F.shiftrightunsigned(hlat, LAT_SHIFT).cast("int").alias("cy"),
        F.shiftrightunsigned(hlon, LON_SHIFT).cast("int").alias("cx"),
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    radius_deg: float = RADIUS_DEG,
) -> DataFrame:
    """All (left, right) pairs within ``radius_deg`` planar degrees.

    ``right`` (the smaller side) is exploded to its 9 neighbor cells;
    candidates are an equi-join on the cell key; the exact squared-
    distance filter runs JVM-side. Production: haversine metric and a
    modular longitude wrap belong exactly at the ``dist2`` expression
    and the neighbor-offset explode respectively.
    """
    r2 = radius_deg * radius_deg
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    r = (
        right.select(
            F.col(right_key),
            F.col("lat").alias("r_lat"),
            F.col("lon").alias("r_lon"),
            "cx",
            "cy",
            F.explode(offsets).alias("o"),
        )
        .select(
            right_key,
            "r_lat",
            "r_lon",
            (F.col("cx") + F.col("o.dx")).alias("jcx"),
            (F.col("cy") + F.col("o.dy")).alias("jcy"),
        )
    )
    j = left.join(
        r, (F.col("cx") == F.col("jcx")) & (F.col("cy") == F.col("jcy"))
    )
    dlat = F.col("lat") - F.col("r_lat")
    dlon = F.col("lon") - F.col("r_lon")
    dist2 = dlat * dlat + dlon * dlon
    return j.filter(dist2 <= F.lit(r2)).select(
        left_key,
        right_key,
        F.round(dist2 + F.lit(1e-9), 6).alias("dist2_deg"),
    )


def nearest_neighbor(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Nearest right-point per left row (broadcast brute force).

    The right side is a bounded dimension: broadcast it, evaluate every
    distance in one map stage, argmin via min_by-style struct ordering
    (ties broken by the right key so the result is deterministic).
    """
    from pyspark.sql.window import Window

    j = left.crossJoin(
        F.broadcast(
            right.select(
                right_key,
                F.col("lat").alias("r_lat"),
                F.col("lon").alias("r_lon"),
            )
        )
    )
    dlat = F.col("lat") - F.col("r_lat")
    dlon = F.col("lon") - F.col("r_lon")
    dist2 = dlat * dlat + dlon * dlon
    w = Window.partitionBy(left_key).orderBy(
        F.col("d2").asc(), F.col(right_key).asc()
    )
    return (
        j.select(left_key, right_key, dist2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            left_key,
            right_key,
            F.round(F.sqrt(F.col("d2")) + F.lit(1e-9), 6).alias("dist_deg"),
        )
    )


def nearest_neighbor_cells(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    ring: int = 2,
) -> DataFrame:
    """EXACT nearest neighbor without the full cross product.

    Same result as ``nearest_neighbor`` (argmin over ALL right rows,
    ties key-broken), different plan:

    1. CANDIDATES: the right side explodes to its (2*ring+1)^2
       neighbor cells and broadcast-equi-joins the left on the cell
       key — candidates per left row scale with local density, not
       |right|.
    2. ARGMIN: ``min(struct(d2, key))`` — a partial-aggregable
       groupBy (map-side combine), NOT a window sort.
    3. EXACTNESS GATE: geometry guarantees any right row OUTSIDE the
       neighborhood is at distance >= ring * cell_edge from anywhere
       in the center cell, so a candidate with d < ring*g is provably
       the global argmin. STRICT inequality: boundary ties (measure-
       zero on md5-fraction coords) are not trusted.
    4. FALLBACK: left rows with no candidate (or only gate-failing
       ones) take the brute-force leg — empty at realistic densities,
       bounded by the sparse-region population otherwise; ``ring`` is
       the density knob.

    At 100 TB this is the plan you want: the big side never shuffles
    (broadcast candidates + partial-agg argmin), and the exact
    fallback self-identifies instead of silently approximating.
    """
    g_lat = 180.0 / (1 << (32 - LAT_SHIFT))
    g_lon = 360.0 / (1 << (32 - LON_SHIFT))
    bound2 = (ring * min(g_lat, g_lon)) ** 2
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-ring, ring + 1)
            for dy in range(-ring, ring + 1)
        ]
    )
    r = (
        right.select(
            F.col(right_key),
            F.col("lat").alias("r_lat"),
            F.col("lon").alias("r_lon"),
            "cx",
            "cy",
            F.explode(offsets).alias("o"),
        )
        .select(
            right_key,
            "r_lat",
            "r_lon",
            (F.col("cx") + F.col("o.dx")).alias("jcx"),
            (F.col("cy") + F.col("o.dy")).alias("jcy"),
        )
    )
    cand = left.join(
        F.broadcast(r),
        (F.col("cx") == F.col("jcx")) & (F.col("cy") == F.col("jcy")),
    )
    dlat = F.col("lat") - F.col("r_lat")
    dlon = F.col("lon") - F.col("r_lon")
    best = (
        cand.select(
            left_key,
            F.struct(
                (dlat * dlat + dlon * dlon).alias("d2"),
                F.col(right_key).alias("rk"),
            ).alias("c"),
        )
        .groupBy(left_key)
        .agg(F.min("c").alias("b"))
    )
    resolved = best.filter(F.col("b.d2") < F.lit(bound2)).select(
        left_key,
        F.col("b.rk").alias(right_key),
        F.round(F.sqrt(F.col("b.d2")) + F.lit(1e-9), 6).alias("dist_deg"),
    )
    leftover = left.join(
        resolved.select(F.col(left_key).alias("__done")),
        F.col(left_key) == F.col("__done"),
        "left_anti",
    )
    fallback = nearest_neighbor(leftover, right, left_key, right_key)
    return resolved.unionByName(fallback)
