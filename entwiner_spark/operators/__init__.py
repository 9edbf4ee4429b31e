from entwiner_spark.operators.graph import SparkGraph
from entwiner_spark.operators.spatial import intersects, dwithin

__all__ = ["SparkGraph", "intersects", "dwithin"]
