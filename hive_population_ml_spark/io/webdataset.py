"""WebDataset tar-shard ingestion and packing (round 12).

WebDataset (the convention popularized by webdataset/webdataset and
used by most public multimodal training corpora — LAION, DataComp,
img2dataset output) stores a dataset as a directory of POSIX tar
files; each SAMPLE is the group of consecutive members sharing a
basename key: ``000017.jpg`` + ``000017.json`` + ``000017.txt`` is one
sample with fields ``jpg``/``json``/``txt``. The key is the basename
up to the FIRST dot (directory prefix included), the field name is
everything after it — so ``a/b/000017.seg.png`` is field ``seg.png``
of sample ``a/b/000017``.

Spark mapping: whole shards stream sequentially, which is 1:1 with
``spark.read.format("binaryFile")`` + a zero-shuffle ``mapInPandas``
decode — one task per shard, samples never split across tasks (the
format guarantees sample contiguity inside a shard). The write path is
the mirror: assign samples to shards, one shuffle to co-locate each
shard's samples, ``applyInPandas`` builds the tar bytes in-task.

Reference parity note: spineda1208/hive-population-ml reads its corpora
from single CSV/XLSX files (src/data/loader.py:21-88); tar-shard io is
part of this repo's §2.10 LLM-pipeline extension surface, not a port.

100 TB posture: reading is a pure map over shard files (no shuffle; a
1000-executor cluster reads 100k shards as 100k independent tasks).
Writing shuffles once on shard_id — contiguous count-based ids keep
every shard ~equal-sized so the shuffle is skew-free by construction;
byte-budget packing composes with ``operators.sampling.pack_shards``
(the two-level running-sum scan) for corpora with fat-tailed sample
sizes. Shard bytes are built and written executor-side; nothing ever
collects to the driver.
"""

from __future__ import annotations

import io as _io
import os
import tarfile

from pyspark.sql import Column, DataFrame, functions as F

# Deterministic tar metadata: byte-identical shards for identical
# inputs (re-runs of an exactly-once sink must not produce new bytes).
_TAR_MTIME = 0


def split_key(name: str) -> tuple[str, str]:
    """WebDataset member-name split: key = up to the first dot of the
    basename (directory prefix kept), field = the rest."""
    d, base = os.path.split(name)
    if "." in base:
        stem, ext = base.split(".", 1)
    else:
        stem, ext = base, ""
    return (os.path.join(d, stem) if d else stem), ext


def iter_tar_samples(blob: bytes):
    """Yield ``(key, {field: bytes})`` samples from one tar shard.

    Members are grouped CONSECUTIVELY by key (the WebDataset contract:
    a sample's files are adjacent in the archive); a key reappearing
    later starts a NEW sample rather than silently merging — loud in
    tests, and what streaming readers do. Compression is transparent
    (``r:*``): plain .tar, .tar.gz, .tar.bz2, .tar.xz all decode.
    """
    cur_key: str | None = None
    cur: dict[str, bytes] = {}
    with tarfile.open(fileobj=_io.BytesIO(blob), mode="r:*") as tf:
        for m in tf:
            if not m.isfile():
                continue
            key, ext = split_key(m.name)
            if key != cur_key:
                if cur_key is not None:
                    yield cur_key, cur
                cur_key, cur = key, {}
            data = tf.extractfile(m)
            cur[ext] = data.read() if data is not None else b""
    if cur_key is not None:
        yield cur_key, cur


def encode_tar_shard(samples, compress: bool = False) -> bytes:
    """Build one deterministic tar shard from ``(key, {field: bytes})``
    pairs: USTAR format, zeroed mtime/uid/gid, 0644 mode — identical
    input yields byte-identical output (idempotent-sink friendly).
    Fields within a sample are emitted in sorted order."""
    buf = _io.BytesIO()
    mode = "w:gz" if compress else "w"
    with tarfile.open(
        fileobj=buf, mode=mode, format=tarfile.USTAR_FORMAT
    ) as tf:
        for key, fields in samples:
            for ext in sorted(fields):
                name = f"{key}.{ext}" if ext else key
                info = tarfile.TarInfo(name=name)
                payload = fields[ext]
                info.size = len(payload)
                info.mtime = _TAR_MTIME
                info.mode = 0o644
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, _io.BytesIO(payload))
    return buf.getvalue()


def tar_shards_to_samples(binary_df: DataFrame) -> DataFrame:
    """Decode a DataFrame of tar shards — ``(path string, content
    binary)``, the ``binaryFile`` source shape — into one row per
    sample: ``(shard, key, fields map<string,binary>, n_fields,
    n_bytes)``.

    Zero shuffle: each shard decodes inside its own task; at 100 TB
    this is a flat map over shard files. Field bytes stay opaque
    binary — downstream decode (image/audio codecs, JSON metadata)
    composes via the existing ``operators.codecs`` / ``from_json``
    paths.
    """
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                for key, fields in iter_tar_samples(bytes(blob)):
                    rows.append(
                        (
                            path,
                            key,
                            fields,
                            len(fields),
                            sum(len(v) for v in fields.values()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["shard", "key", "fields", "n_fields", "n_bytes"],
            )

    return binary_df.mapInPandas(
        parse,
        schema=(
            "shard string, key string, fields map<string,binary>, "
            "n_fields int, n_bytes bigint"
        ),
    )


def pack_samples_to_shards(
    df: DataFrame,
    key_col: str,
    fields: dict[str, str | Column],
    samples_per_shard: int = 1000,
    order_col: str | None = None,
    shard_id: Column | None = None,
    compress: bool = False,
) -> DataFrame:
    """Pack samples into WebDataset tar shards; returns ``(shard_id,
    n_samples, n_bytes, content binary)``.

    ``fields`` maps field name -> string/binary column (strings are
    utf-8 encoded). Shard assignment is count-based by default —
    ``floor(order / samples_per_shard)`` over a DENSE numeric
    ``order_col`` (a pure map, no ranking shuffle); pass an explicit
    ``shard_id`` column to bring byte-budget assignments from
    ``operators.sampling.pack_shards``' manifest instead. The single
    shuffle co-locates each shard's samples (skew-free: count-based
    ids are equal-sized by construction); ``applyInPandas`` builds the
    deterministic tar bytes in-task, sorted by key within the shard.
    """
    if shard_id is None:
        if order_col is None:
            raise ValueError("pass order_col (dense numeric) or shard_id")
        shard_id = (
            F.floor(F.col(order_col) / F.lit(int(samples_per_shard)))
        ).cast("long")

    cols = [F.col(key_col).cast("string").alias("__key")]
    for ext, c in fields.items():
        col = F.col(c) if isinstance(c, str) else c
        cols.append(col.alias(f"__f_{ext}"))
    staged = df.select(shard_id.alias("__shard"), *cols)
    exts = list(fields)

    import pandas as pd

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("__key")
        out_samples = []
        for _, row in pdf.iterrows():
            fd = {}
            for ext in exts:
                v = row[f"__f_{ext}"]
                if v is None:
                    continue
                fd[ext] = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out_samples.append((row["__key"], fd))
        blob = encode_tar_shard(out_samples, compress=compress)
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["__shard"].iloc[0])],
                "n_samples": [len(out_samples)],
                "n_bytes": [len(blob)],
                "content": [blob],
            }
        )

    return staged.groupBy("__shard").applyInPandas(
        build,
        schema=(
            "shard_id long, n_samples int, n_bytes bigint, content binary"
        ),
    )


def write_tar_shards(
    shards_df: DataFrame, out_dir: str, suffix: str = ".tar"
) -> int:
    """Write packed shards as ``shard-%06d.tar`` files under
    ``out_dir`` (executor-side writes — point at shared storage on a
    cluster). Returns the number of shards written; raises if any
    write failed (count mismatch), never a silent partial dataset."""
    os.makedirs(out_dir, exist_ok=True)
    expected = shards_df.count()

    def write_part(rows):
        for r in rows:
            p = os.path.join(out_dir, f"shard-{int(r['shard_id']):06d}{suffix}")
            tmp = p + ".tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(r["content"]))
            os.replace(tmp, p)  # atomic publish per shard

    shards_df.select("shard_id", "content").foreachPartition(write_part)
    written = len(
        [n for n in os.listdir(out_dir) if n.endswith(suffix)]
    )
    if written != expected:
        raise IOError(
            f"wrote {written} shards, expected {expected} under {out_dir}"
        )
    return written
