"""Scalar / array function library (SURVEY.md §2.8).

All functions here are pure Catalyst column expressions — no Python
UDFs in any hot path.  Pandas-UDF fallbacks, where they exist, are
clearly named ``*_udf`` and used only for parity cross-checks.
"""

from entwiner_spark.functions.ids import node_id, float_repr
from entwiner_spark.functions.geo import (
    haversine_m,
    linestring_length_m,
    point_segment_distance_m,
    point_linestring_distance_m,
    bbox_columns,
    meter_bbox,
)

__all__ = [
    "node_id",
    "float_repr",
    "haversine_m",
    "linestring_length_m",
    "point_segment_distance_m",
    "point_linestring_distance_m",
    "bbox_columns",
    "meter_bbox",
]
