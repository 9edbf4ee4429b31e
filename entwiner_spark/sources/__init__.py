from entwiner_spark.sources.geojson import edges_from_geojson, nodes_from_edges

__all__ = ["edges_from_geojson", "nodes_from_edges"]
