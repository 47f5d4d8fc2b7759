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


def gzip_member_offsets(blob: bytes) -> list[tuple[int, int, int]]:
    """Pure gzip-member boundary walk: (member_idx, offset, clen) for
    every COMPLETE member in a concatenated-gzip blob (the Common
    Crawl layout).  A truncated or corrupt trailing member is omitted
    — indexing it would let a range read inflate garbage.  Offsets
    are exact: each member's compressed extent is the bytes the
    decompressor consumed for it."""
    import zlib

    out: list[tuple[int, int, int]] = []
    pos, idx = 0, 0
    while pos < len(blob):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            d.decompress(blob[pos:])
            d.flush()
        except zlib.error:
            break
        if not d.eof:  # truncated final member
            break
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        out.append((idx, pos, consumed))
        pos += consumed
        idx += 1
    return out


def tar_member_offsets(blob: bytes) -> list[tuple[int, int, int]]:
    """Pure tar member-extent walk: (member_idx, offset, length) for
    every member of an UNCOMPRESSED tar blob, offset at the header
    block, length = header block(s) + 512-padded payload (the same
    extent ``write_tar_shards`` records).  Uses tarfile's own header
    parsing (offset/offset_data/size), so GNU long-name extensions
    are covered; a malformed tail is dropped (clean prefix)."""
    import io
    import tarfile

    out: list[tuple[int, int, int]] = []
    try:
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            for idx, m in enumerate(tf):
                end = m.offset_data + ((m.size + 511) // 512) * 512
                if end > len(blob):
                    break  # truncated member: never index it
                out.append((idx, m.offset, end - m.offset))
    except (tarfile.TarError, EOFError, OSError):
        pass
    return out


def build_shard_indexes(
    spark: SparkSession, path_glob: str, kind: str
) -> DataFrame:
    """Build ``.idx`` sidecars for EXISTING shards (e.g. real Common
    Crawl ``*.warc.gz`` you didn't write) so the indexed byte-range
    readers can split them: one pass over each shard walks its member
    boundaries (``kind='gzip'`` for member-per-record gzip, ``'tar'``
    for uncompressed tar) and atomically publishes
    ``<shard>.idx``.  Returns the manifest (shard, n_members) —
    lazy; run an action to perform the writes.  LOCAL/SHARED
    FILESYSTEM ONLY (the sink contract).

    Scale: one whole-shard task per shard — the SAME cost as a single
    whole-shard read, paid once; every later read is range-split.
    """
    if kind not in ("gzip", "tar"):
        raise ValueError(f"build_shard_indexes: kind must be 'gzip' or 'tar', got {kind!r}")
    import pandas as pd

    walk = gzip_member_offsets if kind == "gzip" else tar_member_offsets
    shards = spark.read.format("binaryFile").load(path_glob)

    def index_shard(batches):
        import os

        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                local = local_path(path)
                members = walk(bytes(blob))
                # attempt-unique: concurrent speculative attempts must
                # not interleave into one tmp (last os.replace wins)
                tmp = f"{local}.idx.inprogress.{attempt_token()}"
                with open(tmp, "w") as fh:
                    fh.writelines(f"{i}\t{off}\t{ln}\n" for i, off, ln in members)
                os.replace(tmp, local + ".idx")
                sweep_stale_tmps(local)
                yield pd.DataFrame(
                    {"shard": [local], "n_members": [len(members)]}
                )

    return shards.select("path", "content").mapInPandas(
        index_shard, "shard string, n_members long"
    )


def attempt_token() -> str:
    """Globally unique token for THIS task attempt's tmp-file names.

    ``os.getpid()`` alone is only unique per host — on a shared
    filesystem two speculative attempts on different hosts can collide
    on pid (review r8).  Spark's ``taskAttemptId`` is unique across
    the whole application; the pid rides along as a fallback
    discriminator for driver-side (no TaskContext) callers."""
    import os

    try:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None:
            return f"{ctx.taskAttemptId()}.{os.getpid()}"
    except Exception:  # noqa: BLE001 - any import/ctx oddity: degrade
        pass
    # fallback keeps the cross-host guarantee: hostname + pid is
    # collision-free where pid alone is per-host only (review r8)
    import socket

    return f"d{socket.gethostname()}.{os.getpid()}"


SWEEP_GRACE_SECONDS = 300.0


def sweep_stale_tmps(path: str, grace_seconds: float = SWEEP_GRACE_SECONDS) -> None:
    """Remove orphaned ``<path>.inprogress.*`` / ``<path>.idx.inprogress.*``
    tmps after a successful publish.  Without this, every killed
    attempt leaks a shard-sized orphan forever (review r8).

    Only tmps whose mtime is older than ``grace_seconds`` are swept
    (ADVICE r8): a LIVE speculative sibling attempt is still writing
    its tmp — deleting it would turn a benign duplicate into a
    FileNotFoundError task failure that counts against
    ``spark.task.maxFailures``.  A live writer keeps its tmp's mtime
    fresh (the file is mid-write), so the age gate skips it; a truly
    orphaned tmp (killed attempt) stops aging and is swept by the next
    publisher to land after the grace window.  NFS-style mtime
    granularity is seconds — the 5-minute default dwarfs it.

    Residual window (ADVICE r9, accepted trade-off): a live sibling
    that goes >``grace_seconds`` between two consecutive writes (a
    pathological GC/host pause — the writers loop over IN-MEMORY
    Arrow batches, so there is no slow-upstream wait between writes)
    can still be swept and fail with FileNotFoundError, which
    speculative retry absorbs.  True liveness (pid/host lease files)
    would trade one orphan class for another on a shared filesystem;
    operators on pause-prone hosts should raise ``grace_seconds``
    (it is a parameter, and SWEEP_GRACE_SECONDS the default) — the
    only cost of a large grace is orphan bytes lingering longer.

    Prefix-matched over ONE ``scandir`` pass (never ``glob``: shard
    paths are user-supplied and may contain glob metacharacters like
    ``[01]``, which would match — and delete — a SIBLING shard's live
    tmp, review r8).  Cost is one directory scan per published shard,
    executor-side, negligible next to writing the shard's bytes."""
    import os
    import time

    d, base = os.path.split(path)
    prefixes = (f"{base}.inprogress.", f"{base}.idx.inprogress.")
    try:
        entries = os.listdir(d or ".")
    except OSError:
        return
    cutoff = time.time() - grace_seconds
    for name in entries:
        if name.startswith(prefixes):
            full = os.path.join(d, name)
            try:
                if os.path.getmtime(full) > cutoff:
                    continue  # young enough to be a live sibling: keep
                os.remove(full)
            except OSError:
                pass  # vanished concurrently / perms: never fail publish


def local_path(uri: str) -> str:
    """Filesystem path of a Spark file URI (``input_file_name`` yields
    ``file:///...`` with percent-encoding); non-URI strings pass
    through."""
    from urllib.parse import unquote, urlparse

    u = urlparse(str(uri))
    return unquote(u.path) if u.scheme else str(uri)
