"""Node-identity construction (reference: /root/reference/entwiner/io.py:21-29).

The reference builds node IDs as ``", ".join(str(round(c, precision)))``
over a coordinate pair — Python ``round`` (banker's rounding) and Python
``str(float)`` (shortest round-trip repr).  Parity notes:

- Spark ``bround`` is HALF_EVEN like Python ``round``; plain ``round``
  is HALF_UP and diverges on ties.
- Spark's double->string cast produces the shortest round-trip decimal
  (``47.659887``, ``-122.313294``, ``47.0``) which matches CPython and
  DuckDB for the lon/lat value range (no scientific notation below 1e7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from entwiner_spark.schemas import DEFAULT_PRECISION


def float_repr(c: Column) -> Column:
    """Python-`str(float)`-compatible string for doubles in lon/lat range."""
    return F.col(c).cast("string") if isinstance(c, str) else c.cast("double").cast("string")


def node_id(lon: Column, lat: Column, precision: int = DEFAULT_PRECISION) -> Column:
    """``"{lon}, {lat}"`` with both coordinates banker's-rounded."""
    return F.concat_ws(
        ", ",
        float_repr(F.bround(lon, precision)),
        float_repr(F.bround(lat, precision)),
    )


def node_id_from_coord(coord: Column, precision: int = DEFAULT_PRECISION) -> Column:
    """Node ID from an ``array<double>`` [lon, lat] pair."""
    return node_id(F.element_at(coord, 1), F.element_at(coord, 2), precision)
