"""Sink helpers: the write-side scale posture.

The reference's only sink is R text files, one per reduce task
(``test.go:46-69``).  Here the same parity sink exists
(``operators.wordcount.word_count_partitioned_sink`` /
``MapReduceJob.run``) plus the layouts a 100 TB warehouse actually
uses:

- ``write_partitioned``: hive-style directory partitioning -> readers
  get partition pruning for free;
- ``write_bucketed``: pre-shuffled, bucket-by-key tables -> repeated
  joins/aggs on the bucket key skip their shuffle entirely;
- ``write_files``: format + target-file-count control (small-file
  hygiene: a 100 TB table written from 10k tasks without coalescing
  is a metadata bomb).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Write with an explicit output file count (None = leave the
    partitioning to AQE-coalesced task count)."""
    out = df.coalesce(n_files) if n_files else df
    out.write.format(fmt).mode(mode).save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout; filters on the partition columns
    prune whole directories at read time."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates equal keys at write time so a
    later join/agg on the bucket key reads pre-shuffled data (the
    persistent version of the reference's hash-partitioned
    intermediate files, ``test.go:28-40``)."""
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
