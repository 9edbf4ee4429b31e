"""entwiner_spark — a PySpark-native routable-graph + analytics engine.

A from-scratch re-expression of the capabilities of nbolten/entwiner
(reference surveyed in SURVEY.md) on Spark DataFrames:

- GeoJSON linear-feature ingest -> (edges, nodes) DataFrames
  (reference behavior: /root/reference/entwiner/io.py:10-54)
- A ``SparkGraph`` facade with adjacency / degree / spatial / routing
  queries (reference: entwiner/graphs/digraphdb/)
- Spatial filter-refine queries via bbox columns instead of r-trees
  (reference: entwiner/geopackage/feature_table.py:120-235)
- Superset operators for large-scale training-data pipelines:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  search, text analysis, multimodal binary columns, streaming ingest.

Everything is DataFrame/Catalyst-first and designed for a large cluster:
no driver-side loops over data, broadcast hints for small dims, AQE on.
"""

from entwiner_spark.session import get_spark, stop_spark
from entwiner_spark.sources.geojson import (
    edges_from_geojson,
    node_attrs_from_points,
    nodes_from_edges,
)
from entwiner_spark.sources.parquet_store import (
    read_graph_tables,
    write_graph_tables,
)
from entwiner_spark.operators.graph import SparkGraph
from entwiner_spark.operators.spatial import dwithin, intersects
from entwiner_spark.nxview import LazyDiGraphView

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "edges_from_geojson",
    "node_attrs_from_points",
    "nodes_from_edges",
    "read_graph_tables",
    "write_graph_tables",
    "SparkGraph",
    "LazyDiGraphView",
    "dwithin",
    "intersects",
    "__version__",
]
