"""WebDataset tar-shard io tests (io/webdataset.py): key/field split
convention, consecutive-key sample grouping, deterministic encode,
transparent compression, the pack -> write -> binaryFile -> samples
Spark round trip, and the registered query e2e."""

from __future__ import annotations

import io
import tarfile

import pytest
from pyspark.sql import functions as F

from hive_population_ml_spark.io import webdataset as wds


def test_split_key_convention():
    assert wds.split_key("000017.jpg") == ("000017", "jpg")
    # first dot of the BASENAME splits; directory prefix is kept
    assert wds.split_key("a/b/000017.seg.png") == ("a/b/000017", "seg.png")
    assert wds.split_key("noext") == ("noext", "")
    assert wds.split_key("d.ir/x.txt")[0] == "d.ir/x"


def test_encode_iter_roundtrip_and_determinism():
    samples = [
        ("000000", {"txt": b"alpha", "json": b'{"a":1}'}),
        ("000001", {"txt": b"beta", "cls": b"3", "seg.png": b"\x89PNG"}),
        ("000002", {"txt": b""}),  # empty member survives
    ]
    blob = wds.encode_tar_shard(samples)
    assert blob == wds.encode_tar_shard(samples)  # byte-identical
    back = list(wds.iter_tar_samples(blob))
    assert [k for k, _ in back] == ["000000", "000001", "000002"]
    assert back[0][1] == samples[0][1]
    assert back[1][1]["seg.png"] == b"\x89PNG"
    assert back[2][1]["txt"] == b""
    # gzip-compressed shard decodes transparently (r:*)
    gz = wds.encode_tar_shard(samples, compress=True)
    assert gz[:2] == b"\x1f\x8b"
    assert list(wds.iter_tar_samples(gz))[1][1]["cls"] == b"3"


def test_consecutive_key_grouping_not_global_merge():
    # a key reappearing later starts a NEW sample (the streaming
    # contract) instead of silently merging across the gap
    samples = [
        ("k1", {"txt": b"a"}),
        ("k2", {"txt": b"b"}),
        ("k1", {"txt": b"c"}),
    ]
    back = list(wds.iter_tar_samples(wds.encode_tar_shard(samples)))
    assert [k for k, _ in back] == ["k1", "k2", "k1"]
    assert back[2][1]["txt"] == b"c"


def test_iter_skips_directories():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        m = tarfile.TarInfo("dir/s.txt")
        m.size = 2
        tf.addfile(m, io.BytesIO(b"ok"))
    [(key, fields)] = list(wds.iter_tar_samples(buf.getvalue()))
    assert key == "dir/s" and fields == {"txt": b"ok"}


def test_spark_pack_write_read_roundtrip(spark, tmp_path, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select(
            F.format_string("%06d", "doc_id").alias("key"),
            "doc_id",
            "text",
            F.to_json(F.struct("lang", "source")).alias("meta"),
        )
    )
    shards = wds.pack_samples_to_shards(
        docs,
        key_col="key",
        fields={"txt": "text", "json": "meta"},
        samples_per_shard=25,
        order_col="doc_id",
    )
    out = str(tmp_path / "wds")
    n = wds.write_tar_shards(shards, out)
    assert n == 3  # 60 docs / 25 per shard -> shards 0,1,2
    # the real production read path
    binary = spark.read.format("binaryFile").load(out)
    samples = wds.tar_shards_to_samples(binary)
    got = {
        r["key"]: r
        for r in samples.select(
            "key",
            F.col("fields").getItem("txt").cast("string").alias("txt"),
            F.col("fields").getItem("json").cast("string").alias("js"),
            "n_fields",
        ).collect()
    }
    want = {r["key"]: r for r in docs.collect()}
    assert set(got) == set(want)
    for k, r in want.items():
        assert got[k]["txt"] == r["text"]
        assert got[k]["js"] == r["meta"]
        assert got[k]["n_fields"] == 2
    # per-shard sample counts: 25/25/10
    counts = sorted(
        r["n"]
        for r in samples.groupBy("shard").agg(F.count("*").alias("n"))
        .collect()
    )
    assert counts == [10, 25, 25]


def test_pack_requires_order_or_shard():
    import pandas as pd  # noqa: F401

    with pytest.raises(ValueError, match="order_col"):
        wds.pack_samples_to_shards(None, key_col="k", fields={})


def test_registered_query_e2e(spark, sf_dir):
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    df = QUERIES["s_wds_ingest"](spark, sf_dir)
    rows = df.collect()
    docs = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 200")
        .collect()
    }
    assert len(rows) == len(docs)
    for r in rows[:20]:
        d = docs[int(r["key"])]
        assert r["n_text_chars"] == len(d["text"])
        assert r["lang"] == d["lang"] and r["source"] == d["source"]
        assert r["label"] == str(d["doc_id"] % 5)
        assert r["n_fields"] == 3
