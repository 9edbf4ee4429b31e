"""The graph package on disk: a directory of parquet tables (S5/S7/S8).

The reference's GeoPackage file (one SQLite DB holding edges+nodes,
/root/reference/entwiner/geopackage/__init__.py) maps to a directory:

    <store>/edges.parquet/   partitioned, sorted within partitions on _u
    <store>/nodes.parquet/

Write-time layout IS the index (X1/X3 analogue): repartition on _u +
sortWithinPartitions gives parquet min/max stats that prune adjacency
lookups; bbox columns prune spatial queries.  Publishing goes through a
temp directory + atomic rename, mirroring the reference's
build-then-move lifecycle (/root/reference/entwiner/build.py:34-47).

Concurrency contract (single-writer, snapshot-reader):
- The temp-dir + ``os.replace``-style rename publish means a READER
  never observes a half-written store: it sees either the previous
  directory or the new one, never a mix.  Readers that already hold a
  DataFrame over the old files keep a consistent snapshot until their
  next re-read (POSIX keeps replaced files readable via open handles
  on local/NFS-like stores; on object stores the old prefix lives
  until GC'd).
- WRITERS are not coordinated: two concurrent publishes to the same
  store race on the final rename and the loser's output silently
  wins/loses whole — last-rename-wins, no merge, no corruption.  This
  matches the reference's model (one process rebuilds the GeoPackage,
  build.py); run mutations (delta_apply, flush) from a single writer
  per store.
- Need multi-writer ACID (concurrent MERGEs, audit history, time
  travel)?  Swap this module's publish for a transactional table
  format (Delta Lake / Iceberg ``MERGE INTO``): the operators in
  operators/mutations.py already express Delta MERGE semantics, so
  only the write path changes.  Not bundled here because the sandbox
  ships no Delta/Iceberg jars.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SPATIAL_META = "_spatial_meta.json"
_PROPS_META = "_props_schema.json"

# columns never packed into the JSON blob: graph keys / internal
# layout columns (underscore-prefixed) plus the geometry carriers —
# mirrors the reference's split of geometry vs properties (its
# GeoPackage keeps geometry a real column even under the roadmap's
# serialized-properties schema, TODO.md "Alternative schemas")
_PROPS_GEOM_COLS = ("coordinates", "geom", "geometry")


def pack_properties_json(
    df: DataFrame, exclude: tuple[str, ...] = _PROPS_GEOM_COLS
) -> tuple[DataFrame, str]:
    """The reference roadmap's serialized-properties schema (reference
    TODO.md "Alternative schemas": one TEXT column holding all source
    properties instead of one column per property): fold every
    property column (non-underscore, non-geometry) into a single
    ``properties`` JSON string column.  Returns ``(packed_df,
    schema_json)`` — the exact struct schema as StructType JSON so
    ``unpack_properties_json`` round-trips without inference.

    ``to_json`` omits NULL fields and ``from_json`` yields NULL for
    absent ones, so NULLs round-trip; arrays/structs nest fine.
    Binary properties do NOT survive the JSON hop — keep those in the
    expanded schema (the reference's pickle-encoding alternative is a
    non-goal: not language-portable).
    """
    attrs = [
        c for c in df.columns if not c.startswith("_") and c not in exclude
    ]
    keep = [c for c in df.columns if c not in attrs]
    schema_json = json.dumps(df.select(*attrs).schema.jsonValue())
    packed = df.select(
        *keep, F.to_json(F.struct(*attrs)).alias("properties")
    )
    return packed, schema_json


def unpack_properties_json(df: DataFrame, schema_json: str) -> DataFrame:
    """Inverse of ``pack_properties_json`` given its schema string."""
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(schema_json))
    keep = [c for c in df.columns if c != "properties"]
    if not schema.fields:  # property-less table packed to '{}'
        return df.select(*keep)
    return df.select(
        *keep, F.from_json("properties", schema).alias("_p")
    ).select(*keep, "_p.*")


def write_graph_tables(
    edges: DataFrame,
    nodes: DataFrame | None,
    store_dir: str,
    partitions: int | None = None,
    layer_partitioned: bool = False,
    spatial_cell_deg: float | None = None,
    properties_json: bool = False,
) -> None:
    """Atomic publish of the (edges, nodes) tables to ``store_dir``.

    Writes to a sibling temp dir then renames — readers never observe a
    half-written store (the reference achieves this with shutil.move of
    the temp gpkg, build.py:44-47).

    ``layer_partitioned=True`` additionally directory-partitions edges
    by ``_layer`` (the per-source-file tag from ingest): a multi-layer
    graph store where layer-filtered reads prune whole directories
    before any row is scanned, and each layer file keeps the sorted-_u
    adjacency layout.  Use when layers are few and queries are often
    layer-scoped (the reference's merged-into-unweaver multi-profile
    use case); the flat layout remains the default.

    ``spatial_cell_deg`` directory-partitions edges by the grid cell of
    the bbox min-corner (``_scx``/``_scy`` = floor(_minx|_miny / cell))
    — the storage-layout r-tree analogue (X1) one level above the bbox
    columns: a ``dwithin``/bbox query prunes whole cell directories
    before parquet stats even load (see read_edges_dwithin).  The max
    bbox extents are recorded in ``_spatial_meta.json`` so readers know
    how far a neighbor cell's edge can reach into the query window.
    Pick a cell a few times the typical query radius; at 100 TB this
    bounds a spatial query's input to O(query area), independent of
    corpus size.  Mutually exclusive with ``layer_partitioned``.
    """
    if "://" in store_dir:
        # the rename-based publish is local-filesystem only; object
        # stores need a transactional table format (Delta/Iceberg) or
        # Hadoop FileSystem rename semantics — explicit error beats a
        # mangled local path (TODO.md)
        raise ValueError(
            f"{store_dir}: parquet_store publishes via local-FS rename; "
            "use a local path (cloud stores need a transactional format)"
        )
    parent = os.path.dirname(os.path.abspath(store_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="_graphstore_tmp_", dir=parent)
    props_meta: dict[str, str] | None = None
    try:
        if properties_json:
            # roadmap "Alternative schemas" storage mode: property
            # columns serialize to ONE JSON TEXT column; graph keys,
            # internal (_-prefixed) layout columns, and geometry stay
            # expanded so every adjacency/spatial pruning path below
            # works unchanged.  Inside the try: a packing failure must
            # not leak the temp dir.
            edges, e_schema = pack_properties_json(edges)
            props_meta = {"edges": e_schema}
            if nodes is not None:
                nodes, n_schema = pack_properties_json(nodes)
                props_meta["nodes"] = n_schema
        n = partitions or int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        if layer_partitioned and spatial_cell_deg is not None:
            raise ValueError(
                "layer_partitioned and spatial_cell_deg are mutually "
                "exclusive partitioning layouts"
            )
        if spatial_cell_deg is not None:
            if spatial_cell_deg <= 0:
                raise ValueError(f"spatial_cell_deg={spatial_cell_deg} must be > 0")
            from entwiner_spark.functions.geo import bbox_columns

            if "_minx" not in edges.columns:
                edges = edges.withColumns(
                    bbox_columns(F.col("geom.coordinates"))
                )
            cell = F.lit(float(spatial_cell_deg))
            edges = edges.withColumns(
                {
                    "_scx": F.floor(F.col("_minx") / cell).cast("int"),
                    "_scy": F.floor(F.col("_miny") / cell).cast("int"),
                }
            )
            # one tiny agg: readers must expand the query window by the
            # largest bbox extent to know which neighbor cells to visit
            ext = edges.agg(
                F.max(F.col("_maxx") - F.col("_minx")).alias("w"),
                F.max(F.col("_maxy") - F.col("_miny")).alias("h"),
            ).collect()[0]
            (
                edges.repartition(n, "_u")
                .sortWithinPartitions("_scx", "_scy", "_u")
                .write.mode("overwrite")
                .partitionBy("_scx", "_scy")
                .parquet(f"{tmp}/edges.parquet")
            )
            with open(f"{tmp}/{_SPATIAL_META}", "w") as fh:
                json.dump(
                    {
                        "cell_deg": float(spatial_cell_deg),
                        "max_w": float(ext["w"] or 0.0),
                        "max_h": float(ext["h"] or 0.0),
                    },
                    fh,
                )
        elif layer_partitioned:
            if "_layer" not in edges.columns:
                raise ValueError(
                    "layer_partitioned=True requires a _layer column "
                    "(added by the GeoJSON ingest)"
                )
            # tasks hash on _u; each writes one sorted run per layer it
            # holds -> n files per layer, every file sorted by _u so
            # parquet min/max stats still prune adjacency lookups
            (
                edges.repartition(n, "_u")
                .sortWithinPartitions("_layer", "_u")
                .write.mode("overwrite")
                .partitionBy("_layer")
                .parquet(f"{tmp}/edges.parquet")
            )
        else:
            (
                edges.repartition(n, "_u")
                .sortWithinPartitions("_u")
                .write.mode("overwrite")
                .parquet(f"{tmp}/edges.parquet")
            )
        if nodes is not None:
            nodes.repartition(max(1, n // 4), "_n").sortWithinPartitions(
                "_n"
            ).write.mode("overwrite").parquet(f"{tmp}/nodes.parquet")
        if props_meta is not None:
            with open(f"{tmp}/{_PROPS_META}", "w") as fh:
                json.dump(props_meta, fh)
        if os.path.exists(store_dir):
            shutil.rmtree(store_dir)
        os.rename(tmp, store_dir)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def read_graph_tables(
    spark: SparkSession, store_dir: str, unpack_properties: bool = True
) -> tuple[DataFrame, DataFrame | None]:
    """Load (edges, nodes) back; nodes may be absent for edge-only
    stores (streaming ingest).  A store written with
    ``properties_json=True`` is auto-detected via its schema sidecar
    and transparently unpacked back to expanded columns
    (``unpack_properties=False`` keeps the raw JSON column — e.g. to
    push the string straight to another system)."""
    edges = spark.read.parquet(f"{store_dir}/edges.parquet")
    nodes_path = f"{store_dir}/nodes.parquet"
    nodes = spark.read.parquet(nodes_path) if os.path.exists(nodes_path) else None
    meta_path = f"{store_dir}/{_PROPS_META}"
    if unpack_properties and os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        edges = unpack_properties_json(edges, meta["edges"])
        if nodes is not None and "nodes" in meta:
            nodes = unpack_properties_json(nodes, meta["nodes"])
    return edges, nodes


def read_edges_dwithin(
    spark: SparkSession,
    store_dir: str,
    lon: float,
    lat: float,
    distance_m: float,
    sort: bool = False,
) -> DataFrame:
    """``dwithin`` against a spatial-cell-partitioned store with
    directory-level pruning.

    An edge intersecting the query bbox has its min corner within
    ``max_w``/``max_h`` (recorded at write time) of the window, so the
    candidate cells are a closed range of ``_scx``/``_scy`` — a
    partition filter that skips every other cell directory without
    touching a row group.  Falls back to a plain scan + dwithin when
    the store is not spatially partitioned.
    """
    import math

    from entwiner_spark.functions.geo import meter_bbox
    from entwiner_spark.operators.spatial import dwithin

    edges = spark.read.parquet(f"{store_dir}/edges.parquet")
    meta_path = f"{store_dir}/{_SPATIAL_META}"
    if not os.path.exists(meta_path):
        return dwithin(edges, lon, lat, distance_m, sort=sort)
    with open(meta_path) as fh:
        meta = json.load(fh)
    cell = meta["cell_deg"]
    minx, maxx, miny, maxy = meter_bbox(lon, lat, distance_m)
    pruned = edges.filter(
        F.col("_scx").between(
            int(math.floor((minx - meta["max_w"]) / cell)),
            int(math.floor(maxx / cell)),
        )
        & F.col("_scy").between(
            int(math.floor((miny - meta["max_h"]) / cell)),
            int(math.floor(maxy / cell)),
        )
    )
    return dwithin(pruned, lon, lat, distance_m, sort=sort)


def copy_store(spark: SparkSession, src: str, dst: str) -> None:
    """Database copy (S8: GeoPackage.copy) — re-write through Spark so
    the destination gets fresh stats/layout."""
    edges, nodes = read_graph_tables(spark, src)
    write_graph_tables(edges, nodes, dst)


# --------------------------------------------------------------------
# Versioned store: optimistic concurrency + snapshot reads on local FS
# --------------------------------------------------------------------
#
# The plain write_graph_tables publish is last-rename-wins: a second
# simultaneous writer silently erases the first one's merge, and a
# reader that resolved file paths before the swap can fail mid-scan
# (PLANS.md "Concurrent-writer semantics").  The versioned layout
# fixes both with nothing but POSIX primitives — the miniature form of
# what a Delta/Iceberg transaction log provides:
#
#     <store>/v1/edges.parquet ...     immutable once published
#     <store>/v2/edges.parquet ...
#     <store>/_latest                  text file holding "2"
#
# - Publish = write v{n+1} fully, then os.replace() the pointer file:
#   readers resolve the pointer first, so they always scan a COMPLETE
#   immutable version — no rmtree window, and long scans keep reading
#   their resolved version even after later publishes (snapshot
#   isolation by immutability).
# - Lost updates become DETECTED conflicts: a writer passes the
#   version it read as ``base_version``; if the pointer moved, publish
#   raises ConcurrentWriteError and the caller re-reads + re-merges
#   (the optimistic-retry loop Delta's ConcurrentAppendException
#   drives).  The slot CLAIM itself is an exclusive os.rename — atomic
#   on POSIX — so two same-instant writers never share a version dir;
#   the pointer check only decides who must re-merge.
# - ``vacuum_versions`` deletes all but the newest ``keep`` versions
#   once no reader needs them (the Delta VACUUM analogue).

_LATEST = "_latest"


def _read_pointer(store_dir: str) -> int:
    try:
        with open(os.path.join(store_dir, _LATEST)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def write_graph_tables_versioned(
    edges: DataFrame,
    nodes: DataFrame | None,
    store_dir: str,
    base_version: int | None = None,
    partitions: int | None = None,
) -> int:
    """Publish a new immutable version; returns its number.

    ``base_version`` (from :func:`read_graph_tables_versioned`) arms
    conflict detection: publish refuses with ConcurrentWriteError when
    the store advanced past it, instead of silently dropping the other
    writer's merge.

    Publish builds into a writer-unique temp dir and CLAIMS the
    version slot with an exclusive ``os.rename`` to ``v{n}`` — two
    overlapping writers can never share (or delete) each other's
    version directory: the loser's rename fails against the existing
    slot and only its own private temp dir is cleaned up.  A writer
    that crashed between claiming a slot and swinging the pointer
    leaves an orphaned ``v{n}`` that blocks that slot.  MANUAL
    RECOVERY: every ``base_version`` publish will keep failing with
    ConcurrentWriteError on that same slot (its retry re-reads the
    unchanged pointer and re-collides) until the orphaned directory is
    deleted by hand — the error message names the exact path.  Vacuum
    never touches versions above the pointer because an undeletable
    one may be a live in-flight publish, not an orphan; the pointer
    swing itself is flock-serialized so concurrent *successful*
    writers can never strand a version this way.
    """
    from entwiner_spark.exceptions import ConcurrentWriteError

    if "://" in store_dir:
        raise ValueError(
            f"{store_dir}: versioned store is local-filesystem only"
        )
    os.makedirs(store_dir, exist_ok=True)
    current = _read_pointer(store_dir)
    if base_version is not None and current != base_version:
        raise ConcurrentWriteError(
            f"store {store_dir} is at v{current}, writer based on "
            f"v{base_version}: re-read and re-apply the merge"
        )
    # build into a writer-unique dir first (crashed writers leave only
    # ignorable private litter)
    build_dir = tempfile.mkdtemp(prefix="_version_build_", dir=store_dir)
    build_target = os.path.join(build_dir, "data")
    try:
        write_graph_tables(edges, nodes, build_target, partitions=partitions)
        return _claim_version_slot(store_dir, build_target, base_version)
    finally:
        shutil.rmtree(build_dir, ignore_errors=True)


def _claim_version_slot(
    store_dir: str, build_target: str, base_version: int | None
) -> int:
    """Move a fully-built version at ``build_target`` into the next
    ``v{n}`` slot and swing the ``_latest`` pointer.

    This is the ONLY part of a versioned publish that can race another
    writer (the Spark write above it is writer-private), so it is
    factored out for the multi-process race test
    (tests/test_versioned_race.py) to exercise directly: the claim is
    an exclusive ``os.rename`` — atomic on POSIX — and the pointer
    swing is an ``os.replace``, so readers of ``_latest`` always see a
    complete published version.
    """
    import errno

    from entwiner_spark.exceptions import ConcurrentWriteError

    attempt_floor = 0
    # bounded: 4096 consecutive claimed slots means something other
    # than writer contention is wrong (e.g. a slot-spamming bug)
    for _ in range(4096):
        current = _read_pointer(store_dir)
        if base_version is not None and current != base_version:
            raise ConcurrentWriteError(
                f"store {store_dir} advanced to v{current} during "
                f"publish (writer based on v{base_version}); aborted — "
                "re-read and re-apply the merge"
            )
        new_v = max(current + 1, attempt_floor + 1)
        vdir = os.path.join(store_dir, f"v{new_v}")
        try:
            # exclusive claim: rename fails if the slot exists, so
            # concurrent publishes can never share a version dir
            os.rename(build_target, vdir)
            break
        except OSError as exc:
            # only a taken slot is a claim conflict; EACCES/EROFS/
            # ENOSPC/EXDEV etc. are real failures — surface them
            # instead of spinning (ADVICE r6)
            if exc.errno not in (errno.EEXIST, errno.ENOTEMPTY):
                raise
            if base_version is not None:
                raise ConcurrentWriteError(
                    f"version slot v{new_v} of {store_dir} already "
                    "exists (a concurrent writer claimed it, or a "
                    "crashed writer orphaned it — if the pointer "
                    f"still reads v{current}, delete {vdir} by "
                    "hand); re-read and re-apply the merge"
                ) from exc
            # last-write-wins mode: skip past the taken slot (the
            # claimer may not have swung the pointer yet, so the
            # pointer alone cannot advance new_v)
            attempt_floor = new_v
            continue
    else:
        raise OSError(
            f"{store_dir}: could not claim a version slot after "
            "4096 attempts — every candidate v{n} already exists"
        )
    # pointer swing must never regress: if a concurrent LWW writer
    # already published a LATER version, leave its pointer alone —
    # our version sits at/below the pointer and vacuums normally
    # (ADVICE r6).  The read-check-replace is serialized under a
    # short-lived flock (ADVICE r7: unserialized, two same-instant
    # LWW writers could interleave read-then-replace and swing the
    # pointer BELOW an already-claimed version, stranding it above
    # the pointer where vacuum never reclaims it and where every
    # base_version writer's retry re-conflicts on the occupied slot).
    # The store is local-FS only by contract, so flock is sound; the
    # lock covers only this tiny critical section — claims and Spark
    # writes stay lock-free, and readers never lock (os.replace keeps
    # pointer reads atomic).
    import fcntl

    with open(os.path.join(store_dir, "_latest.lock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if _read_pointer(store_dir) < new_v:
            fd, tmp = tempfile.mkstemp(dir=store_dir, prefix="_latest_tmp_")
            with os.fdopen(fd, "w") as fh:
                fh.write(str(new_v))
            os.replace(tmp, os.path.join(store_dir, _LATEST))
    return new_v


def read_graph_tables_versioned(
    spark: SparkSession, store_dir: str, version: int | None = None
) -> tuple[DataFrame, DataFrame | None, int]:
    """Load ``(edges, nodes, version)`` — the newest version, or a
    pinned older one (time travel over un-vacuumed versions)."""
    v = version if version is not None else _read_pointer(store_dir)
    if v < 1:
        raise FileNotFoundError(f"{store_dir}: no published version")
    edges, nodes = read_graph_tables(spark, os.path.join(store_dir, f"v{v}"))
    return edges, nodes, v


def vacuum_versions(store_dir: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` versions; returns the
    removed version numbers.  Run only when no reader still holds a
    DataFrame over an old version's files."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    current = _read_pointer(store_dir)
    removed = []
    for name in sorted(os.listdir(store_dir)):
        if not name.startswith("v"):
            continue
        try:
            v = int(name[1:])
        except ValueError:
            continue
        if v <= current - keep:
            shutil.rmtree(os.path.join(store_dir, name), ignore_errors=True)
            removed.append(v)
    return removed
