from __future__ import annotations

import json

import pytest

from entwiner_spark.session import get_spark

# Tiny 4-feature fixture network (coordinates published in the
# reference's tests/constants.py; invariants in FIXTURES.md §1).
TINY_COORDS = [
    [[-122.3141965, 47.6598870], [-122.3132940, 47.6598762]],
    [[-122.3144401, 47.6598872], [-122.3141965, 47.6598870]],
    [[-122.3141965, 47.6598870], [-122.3142026, 47.6597293]],
    [[-122.3141795, 47.6605333], [-122.3141965, 47.6598870]],
]

TINY_FC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "geometry": {"type": "LineString", "coordinates": c},
            "properties": {},
        }
        for c in TINY_COORDS
    ],
}


@pytest.fixture(scope="session")
def spark():
    s = get_spark("entwiner-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_geojson(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "tiny.geojson"
    path.write_text(json.dumps(TINY_FC))
    return str(path)


@pytest.fixture(scope="session")
def tiny_edges(spark, tiny_geojson):
    from entwiner_spark.sources.geojson import edges_from_geojson

    return edges_from_geojson(spark, tiny_geojson).cache()


@pytest.fixture(scope="session")
def tiny_nodes(tiny_edges):
    from entwiner_spark.sources.geojson import nodes_from_edges

    return nodes_from_edges(tiny_edges).cache()
