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


def assert_index_coverage(spark: SparkSession, path_glob: str) -> None:
    """Fail LOUDLY when any shard matching ``path_glob`` lacks a
    sidecar: the indexed readers plan splits from ``*.idx`` files
    only, so a directory with partial sidecar coverage (mixed
    ``write_index`` runs, a deleted sidecar) would otherwise silently
    return a SUBSET of the corpus — the one failure mode worse than
    crashing.  Metadata-only: both listings collect shard PATHS
    (bounded by shard count), never payload bytes."""
    from pyspark.errors import AnalysisException

    shard_paths = {
        local_path(r[0])
        for r in spark.read.format("binaryFile")
        .load(path_glob).select("path").collect()
    }
    try:
        idx_paths = {
            local_path(r[0])[: -len(".idx")]
            for r in spark.read.format("binaryFile")
            .load(path_glob + ".idx").select("path").collect()
        }
    except AnalysisException:
        # a glob matching zero files raises PATH_NOT_FOUND — no shard
        # has a sidecar at all
        idx_paths = set()
    missing = sorted(shard_paths - idx_paths)
    if missing:
        raise ValueError(
            f"indexed shard read: {len(missing)} shard(s) matching "
            f"{path_glob!r} have no .idx sidecar (e.g. {missing[:3]}); "
            "re-write them with write_index=True or use the "
            "whole-shard reader"
        )


def local_path(uri: str) -> str:
    """Filesystem path of a Spark file URI (``input_file_name`` yields
    ``file:///...`` with percent-encoding); non-URI strings pass
    through."""
    from urllib.parse import unquote, urlparse

    u = urlparse(str(uri))
    return unquote(u.path) if u.scheme else str(uri)
