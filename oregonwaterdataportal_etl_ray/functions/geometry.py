"""Geometry kernels (M14): circle -> GeoJSON polygon ring.

The reference approximates a circle around a well as a ``num_points``-gon of
geodesic destination points, returned as a GeoJSON polygon ring — a list of
one ring of closed (lon, lat) tuples (``generate_circle_polygon``,
/root/reference/userCode/groundwater/lib.py:4-35; its own test only asserts
the GeoJSON shape, /root/reference/userCode/groundwater/lib_test.py).

This re-derivation uses the standard great-circle destination formula on a
WGS84 mean-radius sphere (public navigation formulae):

    lat2 = asin(sin lat1 * cos d + cos lat1 * sin d * cos theta)
    lon2 = lon1 + atan2(sin theta * sin d * cos lat1,
                        cos d - sin lat1 * sin lat2)

with d = radius / R earth-angle. For the reference's use (radii of feet to a
few miles) the spherical-vs-ellipsoid difference is far below the horizontal
error the circle represents. Vectorized: ``circle_polygons`` computes ALL
rows' rings in one (N, num_points) trig pass — no per-row loop."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EARTH_RADIUS_M = 6371008.8           # WGS84 mean radius
FEET_TO_M = 0.3048


def circle_polygons(lat: np.ndarray, lon: np.ndarray, radius_feet: np.ndarray,
                    num_points: int = 12) -> pa.Array:
    """(N,) centers + radii -> list<list<list<double>>> GeoJSON polygon
    column: one ring per row of ``num_points`` (lon, lat) vertices, closed by
    repeating the first vertex. Bearings sweep 0..360 in equal steps
    (matching the reference's ``range(0, 360, step)``)."""
    lat1 = np.radians(np.asarray(lat, dtype=np.float64))[:, None]
    lon1 = np.radians(np.asarray(lon, dtype=np.float64))[:, None]
    d = (np.asarray(radius_feet, dtype=np.float64) * FEET_TO_M /
         EARTH_RADIUS_M)[:, None]
    # linspace endpoint=False, NOT arange with a float step: step error
    # makes arange emit an extra ~360-degree bearing for some num_points
    # (161, 175, ...), duplicating vertex 0 in the ring
    theta = np.radians(np.linspace(0, 360, num_points, endpoint=False,
                                 dtype=np.float64))[None, :]
    sin_lat2 = np.sin(lat1) * np.cos(d) + np.cos(lat1) * np.sin(d) * np.cos(theta)
    lat2 = np.arcsin(np.clip(sin_lat2, -1.0, 1.0))
    lon2 = lon1 + np.arctan2(np.sin(theta) * np.sin(d) * np.cos(lat1),
                             np.cos(d) - np.sin(lat1) * sin_lat2)
    lon2 = (lon2 + np.pi) % (2 * np.pi) - np.pi          # wrap to [-180, 180)
    lat2_deg, lon2_deg = np.degrees(lat2), np.degrees(lon2)
    # close each ring by repeating vertex 0
    lat_c = np.concatenate([lat2_deg, lat2_deg[:, :1]], axis=1)
    lon_c = np.concatenate([lon2_deg, lon2_deg[:, :1]], axis=1)
    n, p = lat_c.shape
    coords = np.empty((n, p, 2), dtype=np.float64)
    coords[:, :, 0] = lon_c                               # GeoJSON: (lon, lat)
    coords[:, :, 1] = lat_c
    points = pa.FixedSizeListArray.from_arrays(
        pa.array(coords.reshape(-1)), 2)
    rings = pa.ListArray.from_arrays(
        pa.array(np.arange(0, n * p + 1, p, dtype=np.int32)), points)
    polys = pa.ListArray.from_arrays(
        pa.array(np.arange(0, n + 1, dtype=np.int32)), rings)
    return polys


def generate_circle_polygon(center_lat: float, center_lon: float,
                            radius_feet: float,
                            num_points: int = 12) -> list[list[tuple[float, float]]]:
    """Scalar convenience wrapper with the reference's exact signature and
    return shape: ``[[(lon, lat), ...closed ring...]]``."""
    poly = circle_polygons(np.array([center_lat]), np.array([center_lon]),
                           np.array([radius_feet]), num_points)
    ring = poly[0].as_py()[0]
    return [[(float(p[0]), float(p[1])) for p in ring]]


class CirclePolygon:
    """map_batches stage: append a GeoJSON polygon column from lat/lon/radius
    columns — the enrichment the reference applies per well feature."""

    def __init__(self, lat_col: str = "lat", lon_col: str = "lon",
                 radius_col: str = "radius_feet", out_col: str = "polygon",
                 num_points: int = 12):
        self.lat_col, self.lon_col = lat_col, lon_col
        self.radius_col, self.out_col = radius_col, out_col
        self.num_points = num_points

    def __call__(self, batch: pa.Table) -> pa.Table:
        polys = circle_polygons(
            batch[self.lat_col].to_numpy(zero_copy_only=False),
            batch[self.lon_col].to_numpy(zero_copy_only=False),
            batch[self.radius_col].to_numpy(zero_copy_only=False),
            self.num_points)
        return batch.append_column(self.out_col, polys)
