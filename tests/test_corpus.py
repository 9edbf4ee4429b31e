"""Corpus JSONL ingest + partition-pruned parquet sink (sources/corpus)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from entwiner_spark.sources.corpus import (
    documents_from_jsonl,
    read_corpus,
    write_corpus,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_jsonl_ingest_schema_and_synth_ids(spark, tmp_path):
    p = str(tmp_path / "dump.jsonl")
    _write_jsonl(
        p,
        [
            {"doc_id": 1, "text": "alpha beta", "lang": "en", "junk": "ignored"},
            {"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1"},
            {"doc_id": 3, "lang": "en"},  # no text -> dropped
        ],
    )
    df = documents_from_jsonl(spark, p)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {1, 2}
    assert "junk" not in df.columns  # explicit schema: unknown keys unread
    assert rows[2]["source"] == "s1" and rows[1]["source"] is None

    # id synthesis: stable, and identical texts share an id (the
    # documented exact-dedup identity)
    _write_jsonl(
        p,
        [
            {"text": "same words"},
            {"text": "same words"},
            {"text": "other words"},
        ],
    )
    ids = [
        r["doc_id"]
        for r in documents_from_jsonl(
            spark, p, schema="text string", id_col=None
        ).collect()
    ]
    assert ids[0] == ids[1] != ids[2]


def test_corpus_roundtrip_partition_pruning(spark, tmp_path):
    src = str(tmp_path / "in.jsonl")
    _write_jsonl(
        src,
        [
            {"doc_id": i, "text": f"doc {i}", "lang": "en" if i % 2 else "de",
             "source": "s", "n_chars": 5}
            for i in range(20)
        ],
    )
    df = documents_from_jsonl(spark, src)
    out = str(tmp_path / "corpus")
    write_corpus(df, out, partition_by=("lang",))
    assert os.path.isdir(os.path.join(out, "lang=en"))

    back = read_corpus(spark, out)
    assert back.count() == 20
    en = back.filter(F.col("lang") == "en")
    assert en.count() == 10
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split(
        "PartitionFilters"
    )[1][:120]

    # column pruning reaches the scan
    two = read_corpus(spark, out, columns=("doc_id", "text"))
    rs = two._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in rs and "n_chars" not in rs.split("ReadSchema")[1][:200]
