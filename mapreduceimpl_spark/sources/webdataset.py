"""WebDataset-style tar-shard source for multimodal training data.

Large multimodal corpora ship as directories of tar "shards", each
holding samples as members that share a basename key and differ by
extension (``000123.jpg`` + ``000123.txt`` + ``000123.json`` = one
sample) — the WebDataset convention (Aizman et al.; used by LAION,
OpenCLIP, NVIDIA DALI).  This module reads those shards Spark-first:

  * ``spark.read.format("binaryFile")`` lists and reads whole shard
    files — Spark parallelizes at SHARD granularity, which is exactly
    the format's design point (a shard is the unit of sequential I/O
    and of shuffle-free sample locality);
  * an Arrow-batched ``mapInPandas`` unpacks each shard's members with
    stdlib ``tarfile`` — pure Python byte handling, no codec
    libraries, one output row per member;
  * ``group_samples`` reassembles members into samples by (shard,
    key), payloads keyed by extension in a map column.

The payload column is opaque ``binary`` + typed metadata — the same
contract as ``operators.multimodal`` (probe_media & header parsers
plug in directly downstream).

Scale: shards are never split (tar has no mid-file sync marker), so
parallelism = shard count — the corpus layout decision (thousands of
~1 GB shards) is what makes this linear; ``binaryFile`` loads one
shard per task and the generator yields member batches without
materializing a shard's full contents when members are large.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEMBER_SCHEMA = (
    "shard string, member string, key string, ext string, "
    "n_bytes long, payload binary"
)


def read_tar_shards(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per tar member across every shard matching
    ``path_glob``: (shard, member, key, ext, n_bytes, payload).

    ``key``/``ext`` follow the WebDataset split: basename up to the
    FIRST dot is the sample key, the rest is the extension (so
    ``a/b/000123.seg.png`` -> key ``a/b/000123``, ext ``seg.png``).
    Directories and other non-regular members are skipped.
    """
    shards = spark.read.format("binaryFile").load(path_glob)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                out: dict[str, list] = {
                    "shard": [], "member": [], "key": [], "ext": [],
                    "n_bytes": [], "payload": [],
                }
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        payload = tf.extractfile(m).read()
                        name = m.name
                        base, dot, rest = name.partition(".")
                        out["shard"].append(path)
                        out["member"].append(name)
                        out["key"].append(base)
                        out["ext"].append(rest if dot else "")
                        out["n_bytes"].append(len(payload))
                        out["payload"].append(payload)
                yield pd.DataFrame(out)

    return shards.select("path", "content").mapInPandas(unpack, MEMBER_SCHEMA)


def group_samples(members: DataFrame) -> DataFrame:
    """Reassemble members into samples: one row per (shard, key) with
    payloads as an ext -> binary map and the sample's total bytes.

    The groupBy key includes the shard, so a sample never crosses
    shards (the WebDataset contract) and the aggregation is local to
    each shard's output partition after one keyed Exchange.
    """
    return (
        members.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("ext", "payload")))
            ).alias("parts"),
            F.count("*").cast("long").alias("n_members"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
        )
    )
