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
    """Python-`str(float)`-compatible string for doubles in lon/lat range.

    Java's Double.toString switches to scientific notation below 1e-3
    while CPython stays decimal down to 1e-4, so the small-magnitude
    band formats via %.7f with trailing zeros trimmed (exact for
    precision-7-rounded values).  Documented divergence: |x| < 1e-4
    (within ~11 m of the prime meridian/equator) renders decimal
    ("0.0000001") where CPython would use exponent notation ("1e-07").
    """
    x = c.cast("double") if not isinstance(c, str) else F.col(c).cast("double")
    plain = x.cast("string")
    trimmed = F.regexp_replace(F.format_string("%.7f", x), "0+$", "")
    trimmed = F.regexp_replace(trimmed, r"\.$", ".0")
    return F.when((F.abs(x) >= 1e-3) | (x == 0.0), plain).otherwise(trimmed)


def _rounded_repr(x: Column, precision: int) -> Column:
    """str(round(x, p)) parity, including the -0.0 sign that Spark's
    bround loses through BigDecimal (Python round(-1e-12, 7) is -0.0).

    Known divergence (documented, not fixed): when a coordinate's
    shortest decimal repr is an exact tie at precision+1 digits
    (e.g. 107.44880355 at p=7), Spark rounds the decimal string
    (-> ...036) while CPython rounds the exact binary value
    (-> ...035).  Affects only inputs serialized with exactly p+1
    decimals ending in 5.
    """
    b = F.bround(x, precision)
    # -0.0 detection must avoid division (ANSI mode): the string cast
    # preserves the sign bit
    neg_zero = (b == 0.0) & ((x < 0.0) | (x.cast("string") == "-0.0"))
    return F.when(neg_zero, F.lit("-0.0")).otherwise(float_repr(b))


def node_id(lon: Column, lat: Column, precision: int = DEFAULT_PRECISION) -> Column:
    """``"{lon}, {lat}"`` with both coordinates banker's-rounded."""
    return F.concat_ws(
        ", ",
        _rounded_repr(lon.cast("double") if not isinstance(lon, str) else F.col(lon), precision),
        _rounded_repr(lat.cast("double") if not isinstance(lat, str) else F.col(lat), precision),
    )


def node_id_from_coord(coord: Column, precision: int = DEFAULT_PRECISION) -> Column:
    """Node ID from an ``array<double>`` [lon, lat] pair."""
    return node_id(F.element_at(coord, 1), F.element_at(coord, 2), precision)
