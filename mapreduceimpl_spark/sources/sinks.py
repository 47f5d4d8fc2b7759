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


def write_range_sorted(
    df: DataFrame,
    path: str,
    range_cols: Sequence[str],
    n_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Range-clustered layout: repartitionByRange + sortWithinPartitions
    on the same keys, so each output file covers a narrow, disjoint
    slice of the key space and its parquet row-group min/max statistics
    become selective — a point or range predicate on ``range_cols``
    skips whole files/row groups at scan time (poor-man's zone maps).

    This is the read-optimization complement of ``write_bucketed``:
    bucketing kills the next JOIN's shuffle, range-sorting kills the
    next RANGE SCAN's I/O.  At 100 TB the difference between a
    clustered and an unclustered time-series table is reading one
    day's files vs all of them.

    ``n_files`` sets the number of range slices (None = default
    parallelism); range boundaries come from Spark's reservoir sample
    of the keys, so slices are balanced even for skewed keys.
    """
    cols = [df[c] for c in range_cols]
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*cols).write.format(fmt).mode(mode).save(path)
