"""GeoJSON linear-feature ingest (SURVEY.md §2.1 S1/S2/S6, §2.7 U1/U2).

Re-expresses the reference pipeline
(/root/reference/entwiner/io.py:10-58 + geopackagenetwork writes) as a
single declarative DataFrame plan:

    read.json -> explode(features) -> filter LineString
      -> forward ∪ reverse projection (reversed coords, sign-flipped
         columns) -> node-ID construction -> last-write-wins dedup

Scale notes:
- ``spark.read.json`` infers the union property schema across all
  features — that replaces the reference's mid-load ``ALTER TABLE``
  schema evolution (feature_table.py:480-517).
- fid assignment is per-file-offset + 2*feature_index + direction, so
  no global window/sort is needed; only per-file feature counts are
  collected to the driver (#files is metadata-sized).
- dedup is a per-key window (partitioned by (_u,_v)), not a global one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from entwiner_spark.functions.geo import bbox_columns, linestring_length_m
from entwiner_spark.functions.ids import node_id_from_coord
from entwiner_spark.schemas import DEFAULT_PRECISION

#: Columns the engine owns; everything else on the edges DF is a property.
RESERVED_EDGE_COLUMNS = (
    "fid", "_u", "_v", "_layer", "geom",
    "_minx", "_maxx", "_miny", "_maxy", "_length",
)


def _with_string_coords(schema):
    """Copy of an inferred GeoJSON schema with geometry.coordinates
    forced to StringType.  Spark's JSON parser hands back the RAW JSON
    text when the expected type of an array field is string — so a file
    mixing LineString (array²) and MultiLineString (array³) coordinate
    nesting, which breaks union inference, parses losslessly; each
    geometry type is then decoded with ``from_json`` and its exact
    schema."""
    from pyspark.sql import types as T

    def fix_geom(geom_t):
        if not hasattr(geom_t, "names") or "coordinates" not in geom_t.names:
            return geom_t
        return T.StructType(
            [
                T.StructField("coordinates", T.StringType(), True)
                if f.name == "coordinates"
                else f
                for f in geom_t.fields
            ]
        )

    fields = []
    for f in schema.fields:
        if f.name == "geometry":
            fields.append(T.StructField(f.name, fix_geom(f.dataType), True))
        elif f.name == "features" and hasattr(
            getattr(f.dataType, "elementType", None), "names"
        ):
            el = f.dataType.elementType
            el2 = T.StructType(
                [
                    T.StructField("geometry", fix_geom(sf.dataType), True)
                    if sf.name == "geometry"
                    else sf
                    for sf in el.fields
                ]
            )
            fields.append(T.StructField(f.name, T.ArrayType(el2), True))
        else:
            fields.append(f)
    return T.StructType(fields)


def _exploded_features(
    spark: SparkSession,
    paths: str | list[str],
    lines: bool = False,
    raw_coords: bool = False,
) -> DataFrame:
    """Feature rows (file + in-file index) from either format:

    - ``lines=False``: GeoJSON FeatureCollection files.  multiLine JSON
      is unsplittable — each file parses as ONE task, so parallelism is
      capped at #files.  Fine for modest inputs.
    - ``lines=True``: newline-delimited GeoJSON (GeoJSONSeq / .ndjson,
      one Feature per line) — splittable, the 100 TB ingest format.
      Caveat: reference-parity fid assignment needs an in-file order,
      which costs a per-file window; at true scale prefer many files
      (the window parallelizes across files) or accept engine-ordered
      fids.
    """
    from entwiner_spark.exceptions import UnrecognizedFileFormat

    if lines:
        raw = spark.read.json(paths)
        if "geometry" not in raw.columns:
            raise UnrecognizedFileFormat(
                f"{paths}: no GeoJSON features found (expected one "
                "Feature object per line)"
            )
        if raw_coords:
            raw = spark.read.schema(_with_string_coords(raw.schema)).json(paths)
        w = Window.partitionBy("_src").orderBy(F.monotonically_increasing_id())
        return raw.select(
            F.input_file_name().alias("_src"), F.struct(*raw.columns).alias("_f")
        ).withColumn("_pos", F.row_number().over(w) - 1)
    raw = spark.read.option("multiLine", "true").json(paths)
    if raw_coords and "features" in raw.columns:
        raw = (
            spark.read.schema(_with_string_coords(raw.schema))
            .option("multiLine", "true")
            .json(paths)
        )
    if "features" not in raw.columns:
        raise UnrecognizedFileFormat(
            f"{paths}: not a GeoJSON FeatureCollection (no 'features' "
            "array; for newline-delimited GeoJSON pass lines=True)"
        )
    el_type = raw.schema["features"].dataType
    if not hasattr(getattr(el_type, "elementType", None), "names"):
        # an empty features array infers as array<string> — no features
        raise UnrecognizedFileFormat(
            f"{paths}: FeatureCollection contains no features"
        )
    return raw.select(
        F.input_file_name().alias("_src"),
        F.posexplode("features").alias("_pos", "_f"),
    )


def edges_from_geojson(
    spark: SparkSession,
    paths: str | list[str],
    precision: int = DEFAULT_PRECISION,
    changes_sign: tuple[str, ...] = (),
    add_reverse: bool = True,
    with_length: bool = False,
    lines: bool = False,
    split_multilinestrings: bool = False,
    raw_coords: bool = False,
) -> DataFrame:
    """Ingest GeoJSON FeatureCollection(s) into the canonical edges DF.

    Mirrors reference semantics (io.py:10-54): only LineStrings kept;
    every feature yields a forward edge and (if ``add_reverse``) a
    reverse edge with reversed coordinates and ``changes_sign`` columns
    negated; ``_layer`` is the source filename stem; node IDs are
    rounded "lon, lat" strings; edges are unique on (_u, _v) with
    last-write-wins (REPLACE INTO semantics, feature_table.py:601-613).

    ``split_multilinestrings=True`` additionally splits every
    MultiLineString feature into one edge per component LineString —
    the reference's own unimplemented TODO (io.py:36-37).  Mixed
    coordinate nesting breaks union schema inference, so this path
    re-reads with geometry.coordinates as a raw JSON string and decodes
    each geometry type with its exact schema; the split is a per-row
    posexplode (no shuffle).  Sub-feature positions cost one per-file
    window so fids stay unique and ordered.

    ``raw_coords=True`` applies the same raw-JSON coordinate decode
    WITHOUT the MultiLineString split — set it when a file mixes
    geometry types (kerb/crossing Points alongside sidewalk
    LineStrings — the ``node_attrs_from_points`` companion): mixed
    coordinate nesting otherwise degrades schema inference to
    array<string> and every node id comes out NULL.  Non-LineString
    features are still dropped (P10 semantics).
    """
    if split_multilinestrings or raw_coords:
        feats = _exploded_features(spark, paths, lines=lines, raw_coords=True)
        cs = F.col("_f.geometry.coordinates")
        ls = feats.filter(F.col("_f.geometry.type") == "LineString").withColumn(
            "_coords", F.from_json(cs, "array<array<double>>")
        )
        if split_multilinestrings:
            mls = feats.filter(
                F.col("_f.geometry.type") == "MultiLineString"
            ).withColumn(
                "_coords",
                F.explode(F.from_json(cs, "array<array<array<double>>>")),
            )
            linestrings = ls.unionByName(mls).filter(F.size("_coords") >= 2)
        else:
            linestrings = ls.filter(F.size("_coords") >= 2)
        # re-number (sub-)features per file so fid ranges stay unique
        # and gap-free even when splits add rows or dropped Points
        # leave holes in _pos
        w = Window.partitionBy("_src").orderBy(
            F.col("_pos"), F.monotonically_increasing_id()
        )
        linestrings = linestrings.withColumn("_pos", F.row_number().over(w) - 1)
    else:
        # degenerate LineStrings (<2 points) are dropped: invalid
        # GeoJSON, and under ANSI mode an empty coordinates array would
        # abort the node-ID element_at instead of yielding NULL
        feats = _exploded_features(spark, paths, lines=lines)
        linestrings = feats.filter(
            (F.col("_f.geometry.type") == "LineString")
            & (F.size(F.col("_f.geometry.coordinates")) >= 2)
        ).withColumn("_coords", F.col("_f.geometry.coordinates"))

    # Union property schema was inferred by read.json; flatten it.
    # The engine-assigned fid PK is authoritative (a property named
    # "fid" would collide with it, so it is excluded — divergence from
    # the reference documented in SURVEY.md §7 "no parallel edges").
    prop_fields: list[str] = []
    f_type = linestrings.schema["_f"].dataType
    if "properties" in f_type.names:
        ptype = f_type["properties"].dataType
        if hasattr(ptype, "names"):
            prop_fields = [n for n in ptype.names if n not in RESERVED_EDGE_COLUMNS]

    base = linestrings.select(
        "_src",
        "_pos",
        F.regexp_extract(
            F.regexp_replace("_src", r"^file:/+", "/"), r"([^/]+?)(\.[^./]*)?$", 1
        ).alias("_layer"),
        F.struct(
            F.lit("LineString").alias("type"),
            F.col("_coords").alias("coordinates"),
        ).alias("geom"),
        *[F.col(f"_f.properties.{n}").alias(n) for n in prop_fields],
    )

    return edges_from_feature_base(
        base,
        paths,
        prop_fields,
        precision=precision,
        changes_sign=changes_sign,
        add_reverse=add_reverse,
        with_length=with_length,
    )


def edges_from_feature_base(
    base: DataFrame,
    paths: str | list[str],
    prop_fields: list[str],
    precision: int = DEFAULT_PRECISION,
    changes_sign: tuple[str, ...] = (),
    add_reverse: bool = True,
    with_length: bool = False,
) -> DataFrame:
    """Shared back half of every linear-feature ingest (GeoJSON,
    shapefile, ...): fid assignment, forward∪reverse projection,
    node-ID construction, last-write-wins dedup, bbox/length columns.

    ``base`` must carry ``_src``/``_pos`` (file + in-file index),
    ``_layer``, a ``geom`` struct(type, coordinates) holding a
    LineString, and the ``prop_fields`` property columns.
    """
    # Per-file fid offsets: cumulative feature counts in USER path
    # order (write order in the reference's sequential build,
    # /root/reference/entwiner/cli.py:36-41).
    path_list = [paths] if isinstance(paths, str) else list(paths)

    def _order_key(src: str) -> int:
        tail = src.split("://")[-1]
        for i, p in enumerate(path_list):
            if tail.endswith(p.split("://")[-1].lstrip("/")) or p.endswith(tail):
                return i
        return len(path_list)

    per_file = base.groupBy("_src").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    per_file.sort(key=lambda r: (_order_key(r["_src"]), r["_src"]))
    offsets, running = {}, 0
    for row in per_file:
        offsets[row["_src"]] = running
        running += row["_cnt"] * (2 if add_reverse else 1)
    offset_col = F.coalesce(
        *[F.when(F.col("_src") == s, F.lit(o)) for s, o in offsets.items()],
        F.lit(0),
    ) if offsets else F.lit(0)

    step = 2 if add_reverse else 1
    fwd = base.withColumn("_dir", F.lit(0))
    parts = [fwd]
    if add_reverse:
        rev_cols = {
            "geom": F.struct(
                F.lit("LineString").alias("type"),
                F.reverse(F.col("geom.coordinates")).alias("coordinates"),
            )
        }
        for c in changes_sign:
            if c in prop_fields:
                rev_cols[c] = -F.col(c)
        rev = fwd.withColumns({**rev_cols, "_dir": F.lit(1)})
        parts.append(rev)
    both = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])

    edge_coords = F.col("geom.coordinates")
    edges = both.select(
        (offset_col + F.col("_pos") * step + F.col("_dir") + 1).alias("fid"),
        node_id_from_coord(F.element_at(edge_coords, 1), precision).alias("_u"),
        node_id_from_coord(F.element_at(edge_coords, -1), precision).alias("_v"),
        "_layer",
        "geom",
        *[c for c in prop_fields],
    )

    # Last-write-wins dedup on the natural key (U2): keep highest fid.
    w = Window.partitionBy("_u", "_v").orderBy(F.col("fid").desc())
    edges = (
        edges.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    bbox = bbox_columns(F.col("geom.coordinates"))
    edges = edges.withColumns(bbox)
    if with_length:
        edges = edges.withColumn("_length", linestring_length_m(F.col("geom.coordinates")))
    return edges


def nodes_from_edges(
    edges: DataFrame,
    precision: int = DEFAULT_PRECISION,
    point_attrs: DataFrame | None = None,
) -> DataFrame:
    """Derive the nodes table from edge endpoints (S6).

    Reference synthesizes two node rows per edge and upserts them
    (/root/reference/entwiner/geopackagenetwork/edge_table.py:5-33);
    here: endpoint union + dropDuplicates on the node key.

    ``point_attrs`` (reference TODO.md "Bugs → Node attributes" —
    nodes should carry properties for queries/OSM compatibility):
    a ``(_n, attr...)`` frame, typically from
    ``node_attrs_from_points`` — its attribute columns left-join onto
    the endpoint-derived nodes (the U3 schema-evolution shape: new
    columns appear, non-matching nodes get NULLs).  Points that land
    on no edge endpoint are dropped — they describe junctions the
    network doesn't have; promote them to standalone nodes explicitly
    if a feed needs that.
    """
    coords = F.col("geom.coordinates")
    u_nodes = edges.select(
        F.col("_u").alias("_n"),
        F.struct(
            F.lit("Point").alias("type"), F.element_at(coords, 1).alias("coordinates")
        ).alias("geom"),
    )
    v_nodes = edges.select(
        F.col("_v").alias("_n"),
        F.struct(
            F.lit("Point").alias("type"), F.element_at(coords, -1).alias("coordinates")
        ).alias("geom"),
    )
    nodes = u_nodes.unionByName(v_nodes).dropDuplicates(["_n"])
    if point_attrs is not None:
        nodes = nodes.join(point_attrs, "_n", "left")
    return nodes


#: Columns the engine owns on the nodes table.
RESERVED_NODE_COLUMNS = ("_n", "geom")


def node_attrs_from_features(
    points: DataFrame,
    prop_cols: list[str],
    precision: int = DEFAULT_PRECISION,
) -> DataFrame:
    """Core of the Point-feature node-attribute ingest, file-free so
    the catalog oracle can replay it: ``points`` carries ``(_src,
    _pos, _coords array<double>, <prop_cols>...)``; the node id is the
    SAME rounded "lon, lat" string the edge endpoints use (F1/F2), so
    attributes land exactly on the junction nodes they describe;
    duplicates per node resolve last-write-wins (the U2 idiom — later
    file, later feature wins), mirroring the edge table's REPLACE INTO
    semantics."""
    keyed = points.select(
        node_id_from_coord(F.col("_coords"), precision).alias("_n"),
        "_src",
        "_pos",
        *[F.col(c) for c in prop_cols],
    )
    w = Window.partitionBy("_n").orderBy(
        F.col("_src").desc(), F.col("_pos").desc()
    )
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_src", "_pos")
    )


def node_attrs_from_points(
    spark: SparkSession,
    paths: str | list[str],
    precision: int = DEFAULT_PRECISION,
    lines: bool = False,
) -> DataFrame:
    """Node attributes from Point features (reference TODO.md "Bugs →
    Node attributes"; r11-verdict task #3): the LineString-only edge
    ingest (P10) drops Point features, so kerb/crossing/marking
    properties had no path into the graph.  This reads the SAME
    GeoJSON files, keeps the Points, and returns ``(_n, attr...)``
    keyed by the rounded node id — feed it to
    ``nodes_from_edges(edges, point_attrs=...)`` to enrich the nodes
    table (and ``SparkGraph.get_node``/``node_attrs`` thereafter).

    Mixed-geometry files are the norm here (points alongside lines),
    which breaks naive JSON schema inference — coordinates are read
    as raw JSON text and each Point decodes with its exact schema
    (the split_multilinestrings technique).  Tie-break across files is
    lexicographic on the file URI (one source feed per file is the
    expected layout)."""
    feats = _exploded_features(spark, paths, lines=lines, raw_coords=True)
    cs = F.col("_f.geometry.coordinates")
    pts = feats.filter(F.col("_f.geometry.type") == "Point").withColumn(
        "_coords", F.from_json(cs, "array<double>")
    ).filter(F.size("_coords") >= 2)
    prop_fields: list[str] = []
    f_type = feats.schema["_f"].dataType
    if "properties" in f_type.names:
        ptype = f_type["properties"].dataType
        if hasattr(ptype, "names"):
            prop_fields = [
                n for n in ptype.names if n not in RESERVED_NODE_COLUMNS
            ]
    flat = pts.select(
        "_src",
        "_pos",
        "_coords",
        *[F.col(f"_f.properties.{n}").alias(n) for n in prop_fields],
    )
    return node_attrs_from_features(flat, prop_fields, precision=precision)
