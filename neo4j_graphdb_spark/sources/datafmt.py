"""Training-data interchange formats (tier C extension).

JSONL is the lingua franca of LLM corpus exchange; WebDataset-style tar
shards are the multimodal equivalent (payload + metadata members grouped
into sequentially-readable archives). Both here are engine-native:
JSONL rides Spark's built-in json source/sink (sharded, compressible,
schema-checked on read); tar shards are assembled per shard group with
the stdlib ``tarfile`` inside ``applyInPandas`` — real byte-level
plumbing, no external codec dependencies.
"""

from __future__ import annotations

import io
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl(df: DataFrame, path: str, n_shards: int = 4, order_col: str | None = None) -> None:
    """Export a corpus as ``n_shards`` JSONL shard files — the exchange
    format every training pipeline reads. One repartition to the shard
    count (matching the one-file-per-task write contract); downstream
    loaders stream shards independently, so shard count = read
    parallelism."""
    df.repartition(n_shards).write.mode("overwrite").json(path)


def read_jsonl(spark, path: str, schema: str) -> DataFrame:
    """Read a JSONL corpus with an EXPLICIT schema — inference on 100 TB
    means a full extra pass and silently widened types; the declared
    schema also makes corrupt records visible instead of absorbed
    (``columnNameOfCorruptRecord`` stays available to callers)."""
    return spark.read.schema(schema).json(path)


TAR_SHARD_SCHEMA = "shard bigint, n_members bigint, tar binary"


def pack_tar_shards(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_shards: int = 4,
) -> DataFrame:
    """WebDataset-style shard packing: group media rows by a
    deterministic shard id (md5 of the member id — reproducible across
    runs and engines) and assemble each shard's members into ONE tar
    archive, members sorted by id, all header metadata zeroed — so the
    shard BYTES are deterministic and the oracle can check member
    inventories by replaying the hash assignment.

    Sequential-read shards are the point: at training time a worker
    streams one archive instead of issuing millions of small-object
    reads. Shape: one ``applyInPandas`` per shard group — the shuffle
    key IS the shard, each task builds one archive in memory, so shard
    size (``n_shards`` vs corpus bytes) is the memory lever.

    Returns ``(shard, n_members, tar)``.
    """
    with_shard = media.withColumn(
        "_shard",
        F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
            .cast("bigint"),
            F.lit(n_shards),
        ),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col]) if row[payload_col] is not None else b""
                info = tarfile.TarInfo(name=f"{row[id_col]}.bin")
                info.size = len(payload)
                info.mtime = 0  # deterministic bytes: no wall-clock in headers
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(payload))
        return pd.DataFrame(
            {
                "shard": [int(pdf["_shard"].iloc[0])],
                "n_members": [len(pdf)],
                "tar": [buf.getvalue()],
            }
        )

    return (
        with_shard.groupBy("_shard")
        .applyInPandas(build, schema=TAR_SHARD_SCHEMA)
    )


def unpack_tar_shards(shards: DataFrame) -> DataFrame:
    """Inverse of :func:`pack_tar_shards`: explode every member back to
    ``(shard, member, n_bytes, payload_md5)`` rows via ``mapInPandas``
    (streaming batches — a shard never loads more than once per task).
    The md5 column is what round-trip checks compare, byte-for-byte."""
    import hashlib

    def extract(batches):
        for pdf in batches:
            out = {"shard": [], "member": [], "n_bytes": [], "payload_md5": []}
            for _, row in pdf.iterrows():
                with tarfile.open(fileobj=io.BytesIO(bytes(row["tar"]))) as tar:
                    for m in tar.getmembers():
                        data = tar.extractfile(m).read()
                        out["shard"].append(int(row["shard"]))
                        out["member"].append(m.name)
                        out["n_bytes"].append(len(data))
                        out["payload_md5"].append(hashlib.md5(data).hexdigest())
            yield pd.DataFrame(out)

    return shards.mapInPandas(
        extract, schema="shard bigint, member string, n_bytes bigint, payload_md5 string"
    )
