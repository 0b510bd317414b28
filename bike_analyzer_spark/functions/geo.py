"""Geo column primitives — haversine as pure column algebra
(reference utils.py:12-19; SURVEY.md F7/U1: deliberately NOT a UDF so
it stays inside whole-stage codegen)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_R_M = 6371000.0

#: Porto Alegre city center (reference config.py:7-9)
CITY_LAT, CITY_LON = -30.0346, -51.2177


def pseudo_coords_cols(key: Column) -> tuple[Column, Column]:
    """Deterministic pseudo lat/lon near the city center derived from
    an integer key — the testdata has no geo columns, so every
    geo-flavored operator (haversine suite, OD matching) shares this
    one mapping."""
    lat = F.lit(-30.0) + (key % 100) * F.lit(0.01)
    lon = F.lit(-51.2) + ((key * 7) % 100) * F.lit(0.01)
    return lat, lon


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters: 2R*atan2(sqrt(a), sqrt(1-a))."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_R_M) * F.atan2(F.sqrt(a), F.sqrt(F.lit(1.0) - a))
