"""Shared sidecar member-index machinery for splittable shard reads.

Both container formats this repo ships (WebDataset tar, Common Crawl
WARC) are sequential archives Spark cannot split mid-stream, so the
whole-shard readers bound per-task memory by SHARD size.  For shards
you control, the sinks can emit a tiny sidecar index — one
``member_idx\\toffset\\tlength`` line per member — and the indexed
readers plan BYTE-RANGE splits from it, bounding per-task memory by
split size instead.  This module holds the one copy of the split
planning (index lines -> contiguous (shard, start, length,
first_member) ranges) so the two formats can never diverge on the
range arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_member_splits(
    spark: SparkSession, path_glob: str, target_split_bytes: int
) -> DataFrame:
    """Plan contiguous byte-range splits from ``<shard>.idx`` sidecars
    matching ``path_glob + '.idx'``: one output row per split —
    (shard, split_id, start, length, first_member) — where each split
    covers ~``target_split_bytes`` of consecutive members.

    The index lines are METADATA (one tiny row per member), so the
    window/groupBy here shuffles only index rows, never payload
    bytes.  Members are contiguous in member_idx order, so
    [min(offset), min(offset)+sum(length)) is exactly the split's
    byte range.
    """
    if target_split_bytes < 1:
        raise ValueError(
            f"plan_member_splits: target_split_bytes must be >= 1, "
            f"got {target_split_bytes}"
        )
    from pyspark.sql import Window

    lines = spark.read.text(f"{path_glob}.idx").select(
        F.input_file_name().alias("idx_path"), "value"
    )
    parts = F.split(F.col("value"), "\t")
    members = lines.select(
        F.expr("substring(idx_path, 1, length(idx_path) - 4)").alias("shard"),
        parts.getItem(0).cast("long").alias("member_idx"),
        parts.getItem(1).cast("long").alias("offset"),
        parts.getItem(2).cast("long").alias("clen"),
    )
    # split assignment: floor(bytes-before-me / target)
    w_prev = (
        Window.partitionBy("shard")
        .orderBy("member_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        members.withColumn(
            "split_id",
            (
                F.coalesce(F.sum("clen").over(w_prev), F.lit(0))
                / F.lit(int(target_split_bytes))
            ).cast("long"),
        )
        .groupBy("shard", "split_id")
        .agg(
            F.min("offset").alias("start"),
            F.sum("clen").alias("length"),
            F.min("member_idx").alias("first_member"),
        )
    )


def local_path(uri: str) -> str:
    """Filesystem path of a Spark file URI (``input_file_name`` yields
    ``file:///...`` with percent-encoding); non-URI strings pass
    through."""
    from urllib.parse import unquote, urlparse

    u = urlparse(str(uri))
    return unquote(u.path) if u.scheme else str(uri)
