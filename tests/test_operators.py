"""Unit tests for dedup / similarity / text / mutation operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_exact_dedup_finds_planted_duplicates(spark, docs):
    from entwiner_spark.operators.dedup import exact_dedup

    clones = docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    combined = docs.select("doc_id", "text").unionByName(clones)
    out = exact_dedup(combined)
    n_docs = docs.count()
    assert out.count() == n_docs  # one group per distinct text
    assert out.filter(F.col("n_copies") == 2).count() == n_docs
    # canonical keeps the min id (original, not clone)
    assert out.agg(F.max("canonical_id")).collect()[0][0] < 10_000


def test_minhash_identical_texts_collide(spark, docs):
    from entwiner_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    base = docs.select("doc_id", "text").filter(F.size(F.split("text", " ")) >= 3)
    clones = base.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    sig = minhash_signatures(base.unionByName(clones))
    pairs = lsh_candidate_pairs(sig)
    # every (doc, clone) pair must be a candidate (identical signatures)
    n = base.count()
    planted = pairs.filter(F.col("id_b") - F.col("id_a") == 10_000).count()
    assert planted == n


def test_lsh_neardup_is_subset_with_exact_cosines_and_full_dup_recall(spark):
    """LSH-bucketed near-dup: (a) a subset of the brute-force answer
    with identical cosine values, (b) 100% recall on exact duplicates
    (identical vectors share every bucket by construction)."""
    from entwiner_spark.operators.similarity import lsh_neardup_pairs

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(200)
    )
    dups = emb.limit(5).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    allv = emb.unionByName(dups)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_neardup_pairs(allv, dim=64, planes=4, threshold=0.3).collect()
    }
    # planted exact dups always recalled at cosine 1.0
    planted = {(a, b): c for (a, b), c in got.items() if b - a == 10_000}
    assert len(planted) == 5
    assert all(c == 1.0 for c in planted.values())
    # subset of brute force with identical refined values
    a = allv.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = allv.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    from entwiner_spark.operators.similarity import dot_cols, norm

    cos = dot_cols(F.col("va"), F.col("vb"), 64) / (
        norm(F.col("va"), 64) * norm(F.col("vb"), 64)
    )
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
        .collect()
    }
    assert set(got) <= set(brute)
    assert all(brute[p] == c for p, c in got.items())


def test_lsh_neardup_matmul_refine_matches_join_refine(spark):
    """refine='matmul' (per-bucket blocked Gram matrix over
    applyInPandas — the r9 scale path: vectors cross the boundary
    once instead of per-pair through the join) must emit the SAME
    pair set as refine='join', with cosines equal to 1e-9 (summation
    order is the only difference).  Block size is 1024, so a 300-row
    bucket set exercises the single-block path and the planted-dup
    tail the multi-bucket path."""
    from entwiner_spark.operators.similarity import lsh_neardup_pairs

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(300)
    )
    dups = emb.limit(7).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    allv = emb.unionByName(dups)
    j = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_neardup_pairs(
            allv, dim=64, planes=4, threshold=0.3, refine="join"
        ).collect()
    }
    m = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_neardup_pairs(
            allv, dim=64, planes=4, threshold=0.3, refine="matmul"
        ).collect()
    }
    assert set(j) == set(m)
    assert all(abs(j[p] - m[p]) < 1e-9 for p in j)
    with pytest.raises(ValueError, match="refine"):
        lsh_neardup_pairs(allv, dim=64, refine="bogus")


def test_lsh_neardup_degenerate_vectors_dropped_by_both_refines(spark):
    """Zero-norm and NULL embeddings are filtered before either refine
    branch (r9 advice): the join path's 0/0 cosine was NaN, which
    Spark orders above every double so `>= threshold` passed, while
    numpy's NaN compare dropped it and np.stack raised on NULL — the
    branches disagreed exactly on degenerate rows.  Both must now emit
    the SAME pair set, with no pair touching a degenerate id."""
    from entwiner_spark.operators.similarity import lsh_neardup_pairs

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(50)
    )
    degenerate = spark.createDataFrame(
        [
            (90_001, [0.0] * 64),  # zero norm: no cosine direction
            (90_002, None),  # NULL embedding
        ],
        "vec_id long, embedding array<double>",
    )
    allv = emb.unionByName(degenerate)
    pairs = {}
    for refine in ("join", "matmul"):
        pairs[refine] = {
            (r["id_a"], r["id_b"])
            for r in lsh_neardup_pairs(
                allv, dim=64, planes=2, threshold=0.0, refine=refine
            ).collect()
        }
    assert pairs["join"] == pairs["matmul"]
    bad = {90_001, 90_002}
    assert all(a not in bad and b not in bad for a, b in pairs["join"])
    # threshold=0.0 with planes=2 buckets 50 real vectors together
    # aggressively -- the guard must not have dropped real pairs
    assert pairs["join"]


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_jaccard_prefix_filter_matches_brute_force(spark, docs, threshold):
    """The PPJoin-style prefix-filtered join must equal the O(n²)
    brute-force baseline exactly — the filter is a provable superset,
    the refine exact."""
    from entwiner_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    d = docs.select("doc_id", "text").limit(150)
    # plant exact dups so threshold=1.0 has hits
    clones = d.limit(10).select((F.col("doc_id") + 50_000).alias("doc_id"), "text")
    d = d.unionByName(clones)
    brute = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(d, threshold=threshold).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs_prefix(d, threshold=threshold).collect()
    }
    assert fast == brute
    assert fast  # non-degenerate: the planted dups guarantee pairs


def test_lsh_salted_matches_unsalted_on_planted_hot_band(spark, docs):
    """Hot-band escalation (PLANS.md): a planted hot bucket — 60
    identical docs whose signatures all share every band key — must
    yield the IDENTICAL candidate-pair set with and without salting,
    and the salted plan must actually join on the salt sub-key."""
    from entwiner_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = docs.select("doc_id", "text").filter(
        F.size(F.split("text", " ")) >= 3
    ).limit(40)
    hot = spark.range(60).select(
        (F.col("id") + 100_000).alias("doc_id"),
        F.lit("the same boilerplate sentence repeated everywhere").alias("text"),
    )
    sig = minhash_signatures(base.unionByName(hot))
    plain = lsh_candidate_pairs(sig)
    salted = lsh_candidate_pairs(sig, salt=4)
    want = {(r["id_a"], r["id_b"]) for r in plain.collect()}
    got = {(r["id_a"], r["id_b"]) for r in salted.collect()}
    assert got == want
    # all 60*59/2 hot-bucket pairs present
    assert sum(1 for a, b in got if a >= 100_000 and b >= 100_000) == 60 * 59 // 2
    assert "_salt" in salted._jdf.queryExecution().optimizedPlan().toString()


def test_simhash_salted_matches_unsalted(spark, docs):
    from entwiner_spark.operators.dedup import simhash_neardup_pairs

    d = docs.select("doc_id", "text").limit(80)
    plain = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_neardup_pairs(d, max_hamming=3).collect()
    }
    salted = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_neardup_pairs(d, max_hamming=3, salt=4).collect()
    }
    assert salted == plain


def test_lsh_salt_validation(spark, docs):
    from entwiner_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    sig = minhash_signatures(docs.select("doc_id", "text").limit(5))
    with pytest.raises(ValueError, match="salt"):
        lsh_candidate_pairs(sig, salt=1).count()


def test_simhash_is_deterministic_and_bounded(spark, docs):
    from entwiner_spark.operators.dedup import simhash

    out1 = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    out2 = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert out1 == out2
    assert all(0 <= v < (1 << 16) for v in out1.values())


def test_jaccard_self_similarity(spark, docs):
    from entwiner_spark.operators.dedup import ngram_jaccard_pairs

    base = docs.select("doc_id", "text").filter(F.col("doc_id") < 20)
    clones = base.select((F.col("doc_id") + 100).alias("doc_id"), "text")
    pairs = ngram_jaccard_pairs(base.unionByName(clones), threshold=0.999)
    planted = pairs.filter(F.col("id_b") - F.col("id_a") == 100)
    assert planted.count() == 20
    assert all(r["jaccard"] == 1.0 for r in planted.collect())


def test_cosine_topk_self_first(spark):
    from entwiner_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    top = cosine_topk(emb, qvec, k=5).collect()
    assert top[0]["vec_id"] == 3  # self-similarity == 1.0 ranks first
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
    cosines = [r["cosine"] for r in top]
    assert cosines == sorted(cosines, reverse=True)


def test_knn_join_excludes_self(spark):
    from entwiner_spark.operators.similarity import knn_join

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = knn_join(emb.filter(F.col("vec_id") < 5), emb, dim=64, k=3)
    rows = out.collect()
    assert len(rows) == 15
    assert all(r["qid"] != r["nid"] for r in rows)


def test_lsh_bucket_recall(spark):
    """Identical vectors land in identical buckets (sanity floor)."""
    from entwiner_spark.operators.similarity import lsh_buckets

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label")
    )
    b = {r["vec_id"]: r["bucket"] for r in lsh_buckets(doubled, dim=64).collect()}
    for vid in list(b):
        if vid < 10_000:
            assert b[vid] == b[vid + 10_000]


def test_update_columns_merge_semantics(spark):
    from entwiner_spark.operators.mutations import update_columns

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    updates = orders.limit(10).select(
        "o_orderkey",
        F.lit("XXX").alias("o_orderstatus"),
        F.lit(1.5).alias("brand_new_col"),
    )
    out = update_columns(orders, updates, ["o_orderkey"])
    assert out.count() == orders.count()
    assert out.filter(F.col("o_orderstatus") == "XXX").count() == 10
    # schema evolution: new column exists, NULL for unmatched
    assert out.filter(F.col("brand_new_col").isNotNull()).count() == 10


def test_upsert_last_write_wins(spark):
    from entwiner_spark.operators.mutations import upsert

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    incoming = orders.limit(5).withColumn("o_orderstatus", F.lit("NEW"))
    out = upsert(orders, incoming, ["o_orderkey"])
    assert out.count() == orders.count()
    assert out.filter(F.col("o_orderstatus") == "NEW").count() == 5


def test_frame_sampling_slices_and_timestamps(spark):
    from entwiner_spark.operators.multimodal import sample_frames, to_media_table

    df = spark.createDataFrame(
        [(1, "a" * 150), (2, "b" * 64), (3, ""), (4, None)], ["doc_id", "text"]
    )
    media = to_media_table(df, "doc_id", "text")
    frames = sample_frames(media, frame_bytes=64, stride=2, fps=10.0).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    # 150 bytes -> frames 0,1,2; stride 2 samples 0 and 2
    f1 = sorted(by_media[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f1] == [0, 2]
    assert f1[0]["n_bytes"] == 64 and bytes(f1[0]["frame_payload"]) == b"a" * 64
    assert f1[1]["n_bytes"] == 150 - 128  # tail frame is short
    assert f1[1]["ts_ms"] == 2 * 1000.0 / 10.0
    # exactly one full frame
    assert [r["frame_idx"] for r in by_media[2]] == [0]
    # empty and NULL payloads produce no frames
    assert 3 not in by_media and 4 not in by_media


def test_resize_media_truncates_to_pixel_budget(spark):
    from entwiner_spark.operators.multimodal import resize_media, to_media_table

    df = spark.createDataFrame(
        [(1, "x" * 5000), (2, "y" * 10)], ["doc_id", "text"]
    )
    media = to_media_table(df, "doc_id", "text")
    out = {r["media_id"]: r for r in resize_media(media, 16, 16).collect()}
    budget = 16 * 16 * 3
    assert out[1]["meta"]["width"] == 16 and out[1]["meta"]["height"] == 16
    assert out[1]["meta"]["n_bytes"] == budget
    assert len(bytes(out[1]["payload"])) == budget
    # smaller-than-budget payload passes through whole
    assert out[2]["meta"]["n_bytes"] == 10
    assert bytes(out[2]["payload"]) == b"y" * 10


def test_multimodal_feature_plumbing(spark, docs):
    from entwiner_spark.operators.multimodal import extract_features, to_media_table

    media = to_media_table(docs.limit(50), "doc_id", "text")
    assert media.schema["meta"].dataType.names == ["n_bytes", "width", "height", "channels"]
    feats = extract_features(media).collect()
    assert len(feats) == 50
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(r["n_bytes"] > 0 for r in feats)


def _pil_or_none():
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


@pytest.mark.skipif(_pil_or_none() is None, reason="PIL not installed")
def test_real_jpeg_decode_and_resize(spark):
    """When Pillow IS importable, real image types must take the codec
    path: extract_features returns true (width, height, bands, ...) and
    resize_media re-encodes at the requested dimensions."""
    import io

    from entwiner_spark.operators.multimodal import (
        extract_features,
        resize_media,
        to_media_table,
    )

    Image = _pil_or_none()
    buf = io.BytesIO()
    Image.new("RGB", (40, 20), (200, 10, 10)).save(buf, format="JPEG")
    jpeg = buf.getvalue()

    media = to_media_table(
        spark.createDataFrame([(1, jpeg)], ["doc_id", "payload"]),
        "doc_id",
        "payload",
    ).withColumn("media_type", F.lit("image/jpeg"))

    feat = extract_features(media).collect()[0]
    assert feat["feature"][:3] == [40.0, 20.0, 3.0]  # true dims + bands

    out = resize_media(media, 8, 8).collect()[0]
    assert out["meta"]["width"] == 8 and out["meta"]["height"] == 8
    with Image.open(io.BytesIO(bytes(out["payload"]))) as im:
        assert im.size == (8, 8) and im.format == "JPEG"


def _av_or_none():
    try:
        import av

        return av
    except ImportError:
        return None


@pytest.mark.skipif(_av_or_none() is None, reason="PyAV not installed")
def test_real_video_demux_frame_sample(spark):
    """When PyAV IS importable, video/* payloads must take the real
    demux path: sample_frames returns true decoded frames (raw RGB24
    bytes, width*height*3 per frame) at every stride-th presentation
    index, not byte-window chunks.  Mirrors the PIL gate above; in
    the build sandbox PyAV is uninstallable (probe in COVERAGE.md) so
    this skips — on a codec-equipped cluster it exercises
    multimodal._demux_av end-to-end."""
    import io

    from entwiner_spark.operators.multimodal import sample_frames, to_media_table

    av = _av_or_none()
    w, h, n_frames = 32, 16, 8
    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=10)
        stream.width, stream.height, stream.pix_fmt = w, h, "yuv420p"
        import numpy as np

        for i in range(n_frames):
            img = np.full((h, w, 3), i * 20, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    video = buf.getvalue()

    media = to_media_table(
        spark.createDataFrame([(1, video)], ["doc_id", "payload"]),
        "doc_id",
        "payload",
    ).withColumn("media_type", F.lit("video/mp4"))
    rows = sample_frames(media, stride=2).collect()
    assert len(rows) == n_frames // 2
    for r in rows:
        assert r["n_bytes"] == w * h * 3  # raw RGB24, true dimensions
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]


def test_real_image_type_without_codec_falls_back(spark):
    """A real media type on a codec-less worker still produces the
    deterministic arithmetic output (no crash, oracle-stable shape)."""
    from entwiner_spark.operators import multimodal as mm

    if _pil_or_none() is not None:
        pytest.skip("PIL installed; fallback branch not reachable here")
    media = mm.to_media_table(
        spark.createDataFrame([(1, "some-binary-ish text")], ["doc_id", "text"]),
        "doc_id",
        "text",
    ).withColumn("media_type", F.lit("image/jpeg"))
    feat = mm.extract_features(media).collect()[0]
    assert len(feat["feature"]) == 8
    out = mm.resize_media(media, 4, 4).collect()[0]
    assert out["meta"]["width"] == 4


def test_ivf_assign_and_topk(spark):
    from pyspark.sql import functions as F

    from entwiner_spark.operators.similarity import ivf_assign, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    assign = ivf_assign(emb, cents)
    a = {r["vec_id"]: r["centroid"] for r in assign.collect()}
    # each centroid vector is its own nearest centroid (distance 0)
    for k in range(4):
        assert a[k] == k
    assert set(a.values()) <= set(range(4))
    top = ivf_topk(emb.filter(F.col("vec_id") < 3), emb, cents, dim=64, k=2)
    rows = top.collect()
    assert all(r["qid"] != r["nid"] for r in rows)
    # every returned neighbor shares the query's bucket
    for r in rows:
        assert a[r["nid"]] == a[r["qid"]]


def test_ivf_multiprobe_recall_improves(spark):
    """More probes -> recall vs exact top-1 can only improve (and the
    probe buckets are the truly nearest centroids)."""
    from pyspark.sql import functions as F

    from entwiner_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    qids = [r["vec_id"] for r in emb.filter(F.col("vec_id") >= 8).limit(6).collect()]
    queries = emb.filter(F.col("vec_id").isin(qids))

    def recall(probes):
        hits = 0
        approx = ivf_topk(queries, emb, cents, dim=64, k=1, probes=probes)
        got = {r["qid"]: r["nid"] for r in approx.collect()}
        for q in qids:
            qv = [float(x) for x in emb.filter(F.col("vec_id") == q).collect()[0]["embedding"]]
            exact = cosine_topk(emb.filter(F.col("vec_id") != q), qv, k=1).collect()[0]["vec_id"]
            if got.get(q) == exact:
                hits += 1
        return hits

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1


def test_spatial_join_matches_brute_force(spark):
    """Grid-cell bucketed distance join == brute-force cross join +
    exact refine (cells are candidates only; refine decides)."""
    from entwiner_spark.functions.geo import point_linestring_distance_m
    from entwiner_spark.operators.spatial import spatial_join

    pts = spark.range(40).select(
        F.col("id").alias("pid"),
        (F.lit(-122.0) + (F.col("id") % 8) * 0.004).alias("lon"),
        (F.lit(47.0) + (F.col("id") / 8).cast("long") * 0.004).alias("lat"),
    )
    lines = spark.range(15).select(
        F.col("id").alias("lid"),
        F.array(
            F.array(F.lit(-122.0) + F.col("id") * 0.002, F.lit(47.0) + F.col("id") * 0.001),
            F.array(F.lit(-122.0) + F.col("id") * 0.002 + 0.003,
                    F.lit(47.0) + F.col("id") * 0.001 + 0.002),
        ).alias("coordinates"),
    )
    d = 400.0
    got = {
        (r["pid"], r["lid"]): r["_dist"]
        for r in spatial_join(pts, lines, d, "pid", "lid").collect()
    }
    brute = (
        pts.crossJoin(lines)
        .withColumn("_dist", point_linestring_distance_m(
            F.col("lon"), F.col("lat"), F.col("coordinates")))
        .filter(F.col("_dist") < d)
    )
    want = {(r["pid"], r["lid"]): r["_dist"] for r in brute.collect()}
    assert got.keys() == want.keys()
    assert len(want) > 5  # non-trivial fixture
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


# ---- as-of join (operators/asof.py) ---------------------------------

def _asof_fixture(spark):
    from datetime import datetime as dt

    trades = spark.createDataFrame(
        [
            (1, "A", dt(2024, 1, 1, 10, 0, 0), 100.0),
            (2, "A", dt(2024, 1, 1, 10, 5, 0), 101.0),
            (3, "B", dt(2024, 1, 1, 10, 2, 0), 50.0),
            (4, "B", dt(2024, 1, 1, 9, 0, 0), 49.0),  # before any quote
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", dt(2024, 1, 1, 9, 59, 0), 99.5),
            ("A", dt(2024, 1, 1, 10, 0, 0), 100.1),  # tie: ts == trade 1 ts
            ("A", dt(2024, 1, 1, 10, 4, 0), 100.9),
            ("B", dt(2024, 1, 1, 10, 0, 0), 49.9),
        ],
        "sym string, ts timestamp, quote double",
    )
    return trades, quotes


def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd

    from entwiner_spark.operators.asof import asof_join

    trades, quotes = _asof_fixture(spark)
    got = (
        asof_join(trades, quotes, on="ts", by=["sym"])
        .select("trade_id", "quote")
        .toPandas()
        .sort_values("trade_id")
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            trades.toPandas().sort_values("ts"),
            quotes.toPandas().sort_values("ts"),
            on="ts",
            by="sym",
        )
        .sort_values("trade_id")
        .reset_index(drop=True)
    )
    # trade 1 ties quote@10:00 -> inclusive match (100.1); trade 4 has
    # no preceding quote -> NULL
    assert got["quote"].tolist()[0] == 100.1
    assert pd.isna(got["quote"].tolist()[3])
    pd.testing.assert_series_equal(got["quote"], want["quote"], check_names=False)


def test_asof_join_tolerance_drops_stale_matches(spark):
    from entwiner_spark.operators.asof import asof_join

    trades, quotes = _asof_fixture(spark)
    out = {
        r["trade_id"]: r["quote"]
        for r in asof_join(
            trades, quotes, on="ts", by=["sym"], tolerance_us=60_000_000
        ).collect()
    }
    # trade 2 (10:05) matched quote@10:04 -> within 60s, kept
    assert out[2] == 100.9
    # trade 3 (10:02) matched quote@10:00 -> 120s, dropped to NULL
    assert out[3] is None
    # all left rows survive (left-join semantics)
    assert len(out) == 4


def test_asof_join_property_matches_pandas(spark):
    """Property check: on randomized (key, ts) tables the union+window
    as-of join equals pandas merge_asof exactly (backward, inclusive,
    left-join semantics).  Right side unique on (key, ts) per the
    operator's tie contract."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from entwiner_spark.operators.asof import asof_join

    keys = st.integers(min_value=0, max_value=2)
    ts = st.integers(min_value=0, max_value=50)

    @settings(max_examples=15, deadline=None)
    @given(
        left=st.lists(st.tuples(keys, ts), min_size=1, max_size=12),
        right=st.lists(st.tuples(keys, ts), min_size=0, max_size=12, unique=True),
    )
    def run(left, right):
        ldf = spark.createDataFrame(
            [(i, str(k), t) for i, (k, t) in enumerate(left)],
            "trade_id long, sym string, ts long",
        )
        rdf = spark.createDataFrame(
            [(str(k), t, float(k * 1000 + t)) for k, t in right],
            "sym string, ts long, quote double",
        )
        got = (
            asof_join(ldf, rdf, on="ts", by=["sym"])
            .select("trade_id", "quote")
            .toPandas()
            .sort_values("trade_id")
            .reset_index(drop=True)
        )
        if not right:
            assert got["quote"].isna().all()
            return
        lp = pd.DataFrame(
            [(i, str(k), t) for i, (k, t) in enumerate(left)],
            columns=["trade_id", "sym", "ts"],
        )
        rp = pd.DataFrame(
            [(str(k), t, float(k * 1000 + t)) for k, t in right],
            columns=["sym", "ts", "quote"],
        )
        want = (
            pd.merge_asof(
                lp.sort_values(["ts", "trade_id"]),
                rp.sort_values("ts"),
                on="ts",
                by="sym",
            )
            .sort_values("trade_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_series_equal(
            got["quote"], want["quote"], check_names=False
        )

    run()


def test_minhash_xxhash64_fast_path(spark, docs):
    """The xxhash64 variant (JVM-native, no oracle) must behave like
    minhash for LSH purposes: identical texts collide on every band,
    signatures stay in the Mersenne domain, and values are stable."""
    from entwiner_spark.operators.dedup import (
        MERSENNE_P,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = docs.select("doc_id", "text").filter(F.size(F.split("text", " ")) >= 3)
    clones = base.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    sig = minhash_signatures(base.unionByName(clones), hash_fn="xxhash64")
    rows = sig.collect()
    assert all(
        0 <= r[f"m{i}"] < MERSENNE_P for r in rows for i in range(8)
    )
    pairs = lsh_candidate_pairs(sig)
    n = base.count()
    planted = pairs.filter(F.col("id_b") - F.col("id_a") == 10_000).count()
    assert planted == n
    # deterministic across runs
    again = minhash_signatures(base.unionByName(clones), hash_fn="xxhash64").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_minhash_bad_hash_fn_raises(spark, docs):
    import pytest

    from entwiner_spark.operators.dedup import minhash_signatures

    with pytest.raises(ValueError, match="hash_fn"):
        minhash_signatures(docs, hash_fn="sha1")


def test_kmeans_training_improves_and_is_deterministic(spark):
    """Lloyd training: WCSS never increases round over round, beats the
    untrained seed centroids, and reruns produce identical (quantized)
    centroids."""
    from entwiner_spark.operators.similarity import kmeans_centroids, wcss

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c0 = kmeans_centroids(emb, k=4, iterations=0)
    c1 = kmeans_centroids(emb, k=4, iterations=1)
    c5 = kmeans_centroids(emb, k=4, iterations=5)
    w0, w1, w5 = (wcss(emb, c) for c in (c0, c1, c5))
    assert w1 <= w0 * (1 + 1e-9)
    assert w5 <= w1 * (1 + 1e-9)
    assert w5 < w0  # training actually moved the centroids
    assert c5 == kmeans_centroids(emb, k=4, iterations=5)
    assert all(len(c) == 64 for c in c5)


def test_kmeans_trained_centroids_feed_ivf(spark):
    """Trained centroids drop into the existing IVF ANN path."""
    from pyspark.sql import functions as F

    from entwiner_spark.operators.similarity import ivf_assign, kmeans_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = kmeans_centroids(emb, k=4, iterations=3)
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    used = {r["centroid"] for r in assigned.select("centroid").distinct().collect()}
    assert used <= set(range(4)) and len(used) >= 2


def test_kmeans_empty_input_raises(spark):
    import pytest

    from entwiner_spark.operators.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        kmeans_centroids(emb, k=4)


def test_simhash_neardup_identical_docs_distance_zero(spark, docs):
    from entwiner_spark.operators.dedup import simhash_neardup_pairs

    base = docs.select("doc_id", "text").filter(F.col("doc_id") < 30)
    clones = base.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    pairs = simhash_neardup_pairs(base.unionByName(clones), max_hamming=0)
    planted = pairs.filter(F.col("id_b") - F.col("id_a") == 1000)
    assert planted.count() == 30
    assert planted.filter(F.col("hamming") != 0).count() == 0


def test_simhash_neardup_rejects_degenerate_bands(spark, docs):
    import pytest

    from entwiner_spark.operators.dedup import simhash_neardup_pairs

    with pytest.raises(ValueError, match="bits"):
        simhash_neardup_pairs(docs, bits=3, max_hamming=3)


def test_int8_quantize_roundtrip_error_bounded(spark):
    """Dequantized values differ from the original by at most scale/2
    per element, and zero vectors survive (scale 1, all-zero q)."""
    from entwiner_spark.operators.similarity import dequantize_int8, quantize_int8

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    zero = spark.createDataFrame(
        [(99_999, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    q = quantize_int8(emb.unionByName(zero))
    assert q.filter(~F.col("q").cast("array<int>").isNotNull()).count() == 0
    zrow = q.filter(F.col("vec_id") == 99_999).collect()[0]
    assert zrow["scale"] == 1.0 and set(zrow["q"]) == {0}
    back = dequantize_int8(q).withColumnRenamed("embedding", "dq")
    joined = emb.unionByName(zero).join(back, "vec_id")
    worst = joined.select(
        F.array_max(
            F.zip_with(
                "embedding", "dq",
                lambda a, b: F.abs(a.cast("double") - b) ,
            )
        ).alias("err"),
        F.col("vec_id"),
    ).join(q.select("vec_id", "scale"), "vec_id")
    assert worst.filter(F.col("err") > F.col("scale") * 0.5000001).count() == 0
    # int8 range respected
    assert q.filter(
        F.exists("q", lambda x: (x > 127) | (x < -127))
    ).count() == 0


def test_dedup_clusters_transitive(spark):
    """A-B and B-C collapse into one cluster with canonical min id;
    disjoint pairs stay separate; sizes correct."""
    from entwiner_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(5, 9), (9, 12), (30, 40)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup_clusters(pairs).collect()
    }
    assert out == {
        5: (5, 3), 9: (5, 3), 12: (5, 3),
        30: (30, 2), 40: (30, 2),
    }


def test_dedup_clusters_string_ids(spark):
    """dedup_clusters is generic over the id column type: string ids
    must round-trip through CC (not get NULLed by a hard-coded numeric
    cast), with canonical = lexicographic min."""
    from entwiner_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y")],
        ["id_a", "id_b"],
    )
    out = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup_clusters(pairs).collect()
    }
    assert out == {
        "doc-a": ("doc-a", 3), "doc-b": ("doc-a", 3), "doc-c": ("doc-a", 3),
        "x": ("x", 2), "y": ("x", 2),
    }


def test_jaccard_prefix_boundary_threshold(spark):
    """Float-boundary regression (ADVICE r4): t=0.55, |A|=20, B an
    11-word subset has J = 11/20 = 0.55 exactly, but fl(0.55)*20 is a
    hair above 11 — without epsilon slack the size filter and the
    shortened prefix both drop the pair before the exact refine."""
    from entwiner_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    a_words = [f"w{i}" for i in range(20)]
    b_words = a_words[:11]
    df = spark.createDataFrame(
        [(1, " ".join(a_words)), (2, " ".join(b_words))],
        ["doc_id", "text"],
    )
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs_prefix(df, threshold=0.55).collect()
    }
    brute = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.55).collect()
    }
    assert fast == brute == {(1, 2, 0.55)}


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee: two docs sharing a >= k+w-1 = 6-word run
    must share at least one fingerprint; fingerprint sets are ~1/w of
    the shingle count; disjoint texts share nothing."""
    from entwiner_spark.functions.text import winnow_fingerprints

    shared = "quick brown foxes jump over lazy"  # 6 words
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta epsilon"),
            (2, f"one two three {shared} four five"),
            (3, "completely different words here entirely unrelated text"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text")).alias("fps")
        ).collect()
    }
    assert out[1] & out[2], "shared 6-word run must produce a shared fingerprint"
    assert not (out[1] & out[3]) and not (out[2] & out[3])
    # compression: far fewer fingerprints than shingles (11-word doc -> 9
    # shingles -> 6 windows, deduped below that)
    assert 0 < len(out[1]) <= 6


def test_nearest_edge_join_one_row_per_point(spark):
    """Map-matching: at most one matched edge per point, and it is the
    candidate with minimal distance."""
    from entwiner_spark import catalog

    out = catalog.QUERIES["geo_j6_nearest_edge"](spark, SF).collect()
    keys = [r["s_suppkey"] for r in out]
    assert len(keys) == len(set(keys)) and keys
    cand = {
        (r["s_suppkey"], r["p_partkey"]): r["dist_m"]
        for r in catalog.QUERIES["geo_j5_spatial_join"](spark, SF).collect()
    }
    # j5's dist_m is rounded to 3dp, so exact partkey ties can't be
    # re-derived here (the engine ranks on the raw double — the DuckDB
    # oracle checks that exactly); assert the chosen edge achieves the
    # minimal rounded distance and came from the candidate set
    best_d = {}
    for (s, p), d in cand.items():
        best_d[s] = min(best_d.get(s, d), d)
    assert set(keys) == set(best_d)
    for r in out:
        assert (r["s_suppkey"], r["p_partkey"]) in cand
        assert r["dist_m"] == best_d[r["s_suppkey"]]


def test_jaccard_prefix_property_random_docs(spark):
    """Property check on adversarial inputs (empty docs, single words,
    heavy repetition, identical docs): prefix-filtered == brute force
    at several thresholds."""
    from concurrent.futures import ThreadPoolExecutor

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from entwiner_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    word = st.sampled_from(["a", "bb", "ccc", "dd", "e", "ff", "g"])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(
        docs=st.lists(doc, min_size=2, max_size=8),
        # 0.55 / 0.61 are not binary-representable: they exercise the
        # epsilon-slack candidate bounds (ADVICE r4 boundary class)
        threshold=st.sampled_from([0.34, 0.5, 0.55, 0.61, 0.75, 1.0]),
    )
    def run(docs, threshold):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
        )
        # brute and prefix-filtered are independent pipelines over the
        # same frame — overlap them (guide §2.6); assertion unchanged
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_b = pool.submit(
                lambda: ngram_jaccard_pairs(df, threshold=threshold).collect()
            )
            f_f = pool.submit(
                lambda: jaccard_pairs_prefix(df, threshold=threshold).collect()
            )
            brute = {
                (r["id_a"], r["id_b"], r["jaccard"]) for r in f_b.result()
            }
            fast = {
                (r["id_a"], r["id_b"], r["jaccard"]) for r in f_f.result()
            }
        assert fast == brute

    run()


def test_pq_encode_codebook_vectors_roundtrip(spark):
    """Each codebook-source vector must encode to its own index in
    every subspace; a perturbed copy still maps to the nearest code;
    mixed subvector widths raise."""
    import pytest

    from entwiner_spark.operators.similarity import pq_encode

    vecs = [[float((i * 5 + j) % 7) for j in range(8)] for i in range(4)]
    rows = [(i, v) for i, v in enumerate(vecs)]
    near = [x + 0.01 for x in vecs[2]]
    rows.append((99, near))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = [[v[:4] for v in vecs], [v[4:] for v in vecs]]
    got = {
        r["vec_id"]: (r["code_0"], r["code_1"])
        for r in pq_encode(df, books).collect()
    }
    for i in range(4):
        assert got[i] == (i, i)
    assert got[99] == (2, 2)
    with pytest.raises(ValueError, match="mixed subvector widths"):
        pq_encode(df, [[[0.0] * 4, [0.0] * 3], [[0.0] * 4] * 2])


def test_random_projection_matches_hand_computed(spark):
    """rp_p = <vec, hyperplane(p)> / sqrt(dim), rounded — checked
    against a NumPy computation of the same deterministic planes, and
    the plan is a pure projection (no exchange)."""
    import math

    from entwiner_spark.operators.similarity import hyperplane, random_projection

    dim = 8
    vecs = [(i, [float((i * 5 + j) % 11) - 5.0 for j in range(dim)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = random_projection(df, dim=dim, out_dim=3, round_dp=5)
    got = {r["vec_id"]: (r["rp0"], r["rp1"], r["rp2"]) for r in out.collect()}
    for i, v in vecs:
        for p in range(3):
            h = hyperplane(p, dim)
            want = round(sum(x * w for x, w in zip(v, h)) / math.sqrt(dim), 5)
            assert abs(got[i][p] - want) < 1e-9, (i, p, got[i][p], want)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bm25_rank_matches_hand_computed(spark):
    """BM25 scores equal a direct Python computation of the Okapi
    formula on a tiny corpus, ranking puts the term-dense short doc
    first, and the plan is top-k (TakeOrdered), not a global sort."""
    import math

    from entwiner_spark.functions.text import BM25_B, BM25_K1, bm25_rank

    corpus = [
        (0, "spark join spark filter"),
        (1, "join scan filter merge scan row row group"),
        (2, "the quick brown fox"),
        (3, "spark"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    terms = ("spark", "merge")
    got = {r["doc_id"]: r["bm25"] for r in bm25_rank(df, terms, k=10).collect()}

    docs = {i: t.split(" ") for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    dfs = {t: sum(1 for w in docs.values() if t in w) for t in terms}

    def score(i):
        s = 0.0
        for t in terms:
            tf = docs[i].count(t)
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(docs[i]) / avgdl)
            )
        return s

    want = {i: round(score(i), 6) for i in docs if score(i) > 0}
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])
    # doc 3 (single word == query term) outranks everything
    assert max(want, key=want.get) == 3

    plan = bm25_rank(df, terms, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_standardize_zscores_and_constant_dim(spark):
    """Standardized dims have ~0 mean and ~1 population std; a
    constant dimension maps to all-zeros instead of dividing by zero;
    plan has no Generate (explode) — stats come from one wide agg."""
    import math

    rows = [(i, [float(i), 7.0, float(i % 3)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from entwiner_spark.operators.similarity import standardize

    out = standardize(df, dim=3)
    got = {r["vec_id"]: r["z"] for r in out.collect()}
    n = len(rows)
    for d in (0, 2):
        vals = [r[1][d] for r in rows]
        m = round(sum(vals) / n, 6)
        s = round(sum(v * v for v in vals) / n, 6)
        std = math.sqrt(s - m * m)
        for i, v in rows:
            want = round((v[d] - m) / std, 6)
            assert abs(got[i][d] - want) < 1e-9, (i, d)
    assert all(z[1] == 0.0 for z in got.values())
    zcol = [z[0] for z in got.values()]
    assert abs(sum(zcol) / n) < 1e-5
    assert abs(sum(z * z for z in zcol) / n - 1.0) < 1e-4
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan


def test_bigram_logprob_hand_computed(spark):
    """Laplace-smoothed bigram logprob equals a direct Python
    computation on a 3-doc corpus, including normalization via context
    counts and V from the distinct vocabulary."""
    import math

    from entwiner_spark.functions.text import bigram_logprob

    corpus = [(0, "a b a b c"), (1, "a b"), (2, "x")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_logprob(df).collect()
    }
    toks = {i: t.split(" ") for i, t in corpus}
    bigs, ctxs = {}, {}
    for ws in toks.values():
        for p, c in zip(ws, ws[1:]):
            bigs[(p, c)] = bigs.get((p, c), 0) + 1
            ctxs[p] = ctxs.get(p, 0) + 1
    vocab = len({w for ws in toks.values() for w in ws})
    want = {}
    for i, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        lps = [
            math.log((bigs[(p, c)] + 1.0) / (ctxs[p] + vocab)) for p, c in pairs
        ]
        want[i] = (len(pairs), round(sum(lps) / len(lps), 6))
    assert set(got) == set(want)  # doc 2 (single word) absent
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9


def test_lm_score_buckets_thirds_and_boundaries(spark):
    """Head/middle/tail split: every doc bucketed, head scores >= all
    middle scores >= all tail scores, and sizes are near-thirds."""
    from entwiner_spark.functions.text import lm_score_buckets

    rows = [
        (i, " ".join(f"w{(i * j) % (3 + i % 7)}" for j in range(10)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lm_score_buckets(df).collect()
    assert len(out) == 30
    by = {}
    for r in out:
        by.setdefault(r["bucket"], []).append(r["avg_logprob"])
    assert set(by) == {"head", "middle", "tail"}
    assert min(by["head"]) >= max(by["middle"]) >= max(by["tail"])
    for b in by.values():
        assert 5 <= len(b) <= 15


def test_sorted_neighborhood_pairs_reference(spark):
    """Window-3 sorted-neighborhood pairs equal a Python reference
    (per-block sort, adjacent + skip-1 pairs), planted near-identical
    docs land in the same block, and window<2 raises."""
    import pytest

    from entwiner_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [
        (0, "alpha beta gamma one"),
        (1, "alpha beta gamma two"),
        (2, "alpha beta gamma three"),
        (3, "zeta omega psi"),
        (4, "zeta omega chi"),
        (5, "midway totally different"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, window=3).collect()
    }
    # Python reference
    import re

    keyed = [(re.sub(r"\s+", " ", t).lower(), i) for i, t in rows]
    blocks = {}
    for k, i in keyed:
        blocks.setdefault(k[:8], []).append((k, i))
    want = set()
    for items in blocks.values():
        items.sort()
        for pos, (_, i) in enumerate(items):
            for off in (1, 2):
                if pos + off < len(items):
                    j = items[pos + off][1]
                    want.add((min(i, j), max(i, j)))
    assert got == want
    assert (0, 1) in got and (3, 4) in got
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, window=1)


def test_minhash_calibration_exact_for_identical_docs(spark):
    """A planted exact duplicate pair has est == exact == 1.0 and
    abs_err 0; disjoint docs sharing a band (if any) stay bounded."""
    from entwiner_spark.catalog import QUERIES

    import tempfile, os, shutil

    # reuse the catalog query against a tiny synthetic parquet dir
    tmp = tempfile.mkdtemp()
    try:
        rows = [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),  # exact dup of 0
            (2, "one two three four five six seven"),
        ]
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            os.path.join(tmp, "documents.parquet")
        )
        out = {
            (r["id_a"], r["id_b"]): (r["est_jaccard"], r["exact_jaccard"], r["abs_err"])
            for r in QUERIES["d12_minhash_calibration"](spark, tmp).collect()
        }
        assert (0, 1) in out
        assert out[(0, 1)] == (1.0, 1.0, 0.0)
        for est, exact, err in out.values():
            assert abs(abs(est - exact) - err) < 1e-9
    finally:
        shutil.rmtree(tmp)


def test_media_from_binary_files_ingest(spark, tmp_path):
    """binaryFile ingest: real files on disk become canonical media
    rows (typed by extension, sized from the reader, payload intact),
    glob filtering works, and downstream multimodal operators run on
    the result unchanged."""
    from entwiner_spark.operators.multimodal import extract_features
    from entwiner_spark.sources.binary import media_from_binary_files

    d = tmp_path / "media" / "sub"
    d.mkdir(parents=True)
    (d / "a.jpg").write_bytes(b"\xff\xd8fakejpegbytes")
    (d / "b.png").write_bytes(b"\x89PNGfake")
    (d / "c.bin").write_bytes(b"opaque")
    media = media_from_binary_files(spark, str(tmp_path / "media"))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.jpg", "b.png", "c.bin"}
    assert rows["a.jpg"]["media_type"] == "image/jpeg"
    assert rows["b.png"]["media_type"] == "image/png"
    assert rows["c.bin"]["media_type"] == "application/octet-stream"
    assert bytes(rows["a.jpg"]["payload"]) == b"\xff\xd8fakejpegbytes"
    assert rows["a.jpg"]["meta"]["n_bytes"] == len(b"\xff\xd8fakejpegbytes")
    assert len({r["media_id"] for r in rows.values()}) == 3

    only_jpg = media_from_binary_files(spark, str(tmp_path / "media"), glob="*.jpg")
    assert only_jpg.count() == 1

    feats = extract_features(media.drop("path"))
    assert feats.count() == 3


def test_ewma_matches_sequential_reference(spark):
    """Per-key EWMA equals a sequential Python reference over (ts, id)
    order across multiple keys, and alpha bounds are enforced."""
    import pytest

    from entwiner_spark.operators.timeseries import ewma

    rows = []
    for u in range(3):
        for t in range(12):
            rows.append((u, t, t * 1000 + u, float((u * 7 + t * 3) % 10) + 0.25))
    df = spark.createDataFrame(
        rows, "user_id long, tick long, event_id long, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("tick") * 1_000_000))
    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma(df, alpha=0.3).collect()
    }
    want = {}
    for u in range(3):
        seq = sorted((t, e, v) for (uu, t, e, v) in rows if uu == u)
        y = None
        for _, eid, x in seq:
            y = x if y is None else 0.3 * x + 0.7 * y
            want[(u, eid)] = round(y, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, alpha=0.0)


def test_ivfpq_encode_matches_numpy_reference(spark):
    """IVF-PQ residual encode == a NumPy reference (nearest centroid,
    residual, per-subspace nearest code with first-match ties)."""
    from entwiner_spark.operators.similarity import ivfpq_encode

    dim, n = 8, 40
    cents = [[float(k)] * dim for k in range(3)]
    codebooks = [
        [[0.0] * 4, [1.0] * 4, [-1.0] * 4],   # subspace 0 (dims 0-3)
        [[0.5] * 4, [2.0] * 4],               # subspace 1 (dims 4-7)
    ]
    rows = [
        (i, [((i * 3 + j) % 7) / 2.0 for j in range(dim)]) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["centroid"], r["code_0"], r["code_1"])
        for r in ivfpq_encode(df, cents, codebooks).collect()
    }
    for i, v in rows:
        d = [sum((x - c) ** 2 for x, c in zip(v, ck)) for ck in cents]
        ci = d.index(min(d))
        resid = [x - cents[ci][j] for j, x in enumerate(v)]
        codes = []
        for s, cb in enumerate(codebooks):
            sub = resid[s * 4 : (s + 1) * 4]
            e = [sum((x - c) ** 2 for x, c in zip(sub, code)) for code in cb]
            codes.append(e.index(min(e)))
        assert got[i] == (ci, codes[0], codes[1]), i


def test_simplify_area_filter_drops_jitter_keeps_kinks(spark):
    """Area-filter simplification: endpoints always kept, the
    near-collinear jitter vertex dropped, real kinks kept, 2-point
    lines untouched, and the plan stays UDF-free (no BatchEvalPython)."""
    from entwiner_spark.functions.geo import simplify_area_filter

    rows = [
        (0, [[0.0, 0.0], [1.0, 1e-12], [2.0, 0.0], [3.0, 1.0], [4.0, 0.0]]),
        (1, [[0.0, 0.0], [5.0, 5.0]]),
    ]
    df = spark.createDataFrame(rows, "fid long, coords array<array<double>>")
    out = df.select(
        "fid", simplify_area_filter(F.col("coords"), 1e-6).alias("s")
    )
    got = {r["fid"]: r["s"] for r in out.collect()}
    assert got[0] == [[0.0, 0.0], [2.0, 0.0], [3.0, 1.0], [4.0, 0.0]]
    assert got[1] == [[0.0, 0.0], [5.0, 5.0]]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_ewma_string_key_and_empty_coords_simplify(spark):
    """Regression (review findings): ewma works with a non-long key
    column; simplify_area_filter returns degenerate polylines
    unchanged instead of crashing on the descending-sequence trap."""
    from entwiner_spark.functions.geo import simplify_area_filter
    from entwiner_spark.operators.timeseries import ewma

    rows = [("de", 0, 100, 1.0), ("de", 1, 101, 3.0), ("fr", 0, 200, 5.0)]
    df = spark.createDataFrame(
        rows, "lang string, tick long, event_id long, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("tick") * 1_000_000))
    got = {
        (r["lang"], r["event_id"]): r["ewma"]
        for r in ewma(df, alpha=0.5, key_col="lang").collect()
    }
    assert got == {("de", 100): 1.0, ("de", 101): 2.0, ("fr", 200): 5.0}

    gdf = spark.createDataFrame(
        [(0, []), (1, [[1.0, 2.0]])], "fid long, coords array<array<double>>"
    )
    out = {
        r["fid"]: r["s"]
        for r in gdf.select(
            "fid", simplify_area_filter(F.col("coords"), 1e-6).alias("s")
        ).collect()
    }
    assert out == {0: [], 1: [[1.0, 2.0]]}


def test_kl_divergence_identical_slice_is_minimal(spark):
    """A slice distributed like the corpus has near-zero KL; a
    disjoint-vocabulary slice has much larger KL; values match a
    direct Python computation."""
    import math
    import os, shutil, tempfile

    from entwiner_spark.catalog import QUERIES

    tmp = tempfile.mkdtemp()
    try:
        rows = (
            [(i, "a b c d", "same", "s", 4) for i in range(10)]
            + [(100 + i, "a b c d", "mirror", "s", 4) for i in range(10)]
            + [(200 + i, "x y z w", "other", "s", 4) for i in range(10)]
        )
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {r["lang"]: r["kl"] for r in QUERIES["t18_kl_divergence"](spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp)
    # python reference
    corpus = {"a": 20, "b": 20, "c": 20, "d": 20, "x": 10, "y": 10, "z": 10, "w": 10}
    n, v = sum(corpus.values()), len(corpus)
    def kl(counts):
        nl = sum(counts.values())
        s = 0.0
        for wd in corpus:
            p = (counts.get(wd, 0) + 1) / (nl + v)
            q = (corpus[wd] + 1) / (n + v)
            s += p * math.log(p / q)
        return round(s, 6)
    want_same = kl({"a": 10, "b": 10, "c": 10, "d": 10})
    want_other = kl({"x": 10, "y": 10, "z": 10, "w": 10})
    assert abs(got["same"] - want_same) < 1e-6
    assert abs(got["other"] - want_other) < 1e-6
    assert got["other"] > got["same"]


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered files cover compact (x, y) rectangles: the summed
    per-file span of BOTH columns is far below the unsorted layout's,
    so parquet min/max stats prune range filters on either column.
    zorder_value is deterministic and interleaves correctly."""
    import os

    from entwiner_spark.operators.layout import zorder_layout, zorder_value

    df = spark.range(4096).select(
        F.col("id").alias("rid"),
        (F.col("id") % 64).cast("double").alias("x"),
        (F.expr("id div 64")).cast("double").alias("y"),
    )
    # hand-check the Morton code on a tiny case: x=3 (0b11), y=1 (0b01)
    # over [0,64) at 6 bits -> nx=3, ny=1 -> interleave = 0b0111 = 7
    row = (
        spark.range(1)
        .select(
            zorder_value(
                F.lit(3.0), F.lit(1.0), 0.0, 64.0, 0.0, 64.0, bits=6
            ).alias("zv")
        )
        .collect()[0]
    )
    assert row["zv"] == 7

    def file_spans(path):
        d = spark.read.parquet(path).withColumn(
            "f", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        spans = d.groupBy("f").agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        r = spans.agg(F.sum("sx"), F.sum("sy")).collect()[0]
        return float(r[0]), float(r[1])

    base = os.path.join(str(tmp_path), "plain")
    df.orderBy(F.md5(F.col("rid").cast("string"))).repartition(16).write.parquet(base)
    zpath = os.path.join(str(tmp_path), "zorder")
    zorder_layout(df, "x", "y", 0.0, 64.0, 0.0, 64.0, partitions=16).write.parquet(
        zpath
    )
    px, py = file_spans(base)
    zx, zy = file_spans(zpath)
    # plain random layout: every file spans ~the full range on both
    # axes; z-order must cut the combined span at least 2x on each
    assert zx < px / 2 and zy < py / 2, (px, py, zx, zy)


def test_simplify_area_filter_properties(spark):
    """Hypothesis: for arbitrary small polylines and tolerances,
    simplification (a) preserves endpoints, (b) emits a subsequence of
    the input, (c) is monotone in tolerance (higher tol keeps a subset
    of what lower tol keeps — one-pass areas are fixed, so the kept
    index set can only shrink)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from entwiner_spark.functions.geo import simplify_area_filter

    coord = st.floats(
        min_value=-50.0, max_value=50.0, allow_nan=False, allow_infinity=False
    )
    point = st.tuples(coord, coord).map(list)
    line = st.lists(point, min_size=0, max_size=8)

    @settings(max_examples=12, deadline=None)
    @given(coords=line, tol=st.sampled_from([0.0, 1e-6, 0.5, 10.0]))
    def run(coords, tol):
        df = spark.createDataFrame(
            [(0, coords)], "fid long, coords array<array<double>>"
        )
        lo = df.select(
            simplify_area_filter(F.col("coords"), tol).alias("s")
        ).collect()[0]["s"]
        hi = df.select(
            simplify_area_filter(F.col("coords"), tol * 10 + 1.0).alias("s")
        ).collect()[0]["s"]
        if len(coords) < 2:
            assert lo == coords
            return
        assert lo[0] == coords[0] and lo[-1] == coords[-1]
        # subsequence of the input
        it = iter(coords)
        assert all(any(p == q for q in it) for p in lo)
        # monotone: the higher-tolerance result is a subset (as index
        # sets; compare as multisets of points, both subsequences)
        it2 = iter(lo)
        assert all(any(p == q for q in it2) for p in hi)

    run()


def test_let_bound_preserves_semantics(spark):
    """let_bound(v, body) must equal body(v) exactly — it is an
    evaluation-count optimization, never a semantic change — for
    array, scalar, and null-producing values."""
    from entwiner_spark.functions.expr import let_bound

    df = spark.createDataFrame(
        [("a b c d",), ("x",), (None,)], ["t"]
    )
    v = F.split(F.col("t"), " ")

    def body(x):
        return F.when(F.size(x) >= 2, F.size(x) * 10).otherwise(F.lit(-1))

    got = df.select(
        body(v).alias("plain"), let_bound(v, body).alias("bound")
    ).collect()
    for r in got:
        assert r["plain"] == r["bound"], r
