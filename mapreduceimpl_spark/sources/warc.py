"""WARC source/sink for web-crawl corpora — the Common Crawl layout.

Web-scale LLM pretraining data arrives as WARC: directories of
``*.warc.gz`` shards, each a CONCATENATION OF GZIP MEMBERS with one
WARC record per member (the Common Crawl convention — member-per-
record is what makes per-record random access and range requests
possible; single-stream files are also legal and also handled).  A
record is ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n\\r\\n`` +
``Content-Length`` payload bytes + ``\\r\\n\\r\\n``.  WET extracts
(``warc_type = 'conversion'``) carry plain-text payloads.

Spark-first shape, mirroring ``sources.webdataset``:

  * ``spark.read.format("binaryFile")`` lists and reads whole shards —
    parallelism = shard count, the format's own unit of sequential
    I/O (gzip members can't be split mid-stream without an index);
  * an Arrow-batched ``mapInPandas`` inflates the members with stdlib
    zlib (``decompressobj`` + ``unused_data`` walks the member chain)
    and parses records — one output row per record;
  * ``warc_conversion_text`` is the WET extraction step.

Truncation rule (the byte-decoder contract shared with
``operators.multimodal``): a truncated gzip member, a header block
with no terminator, or a Content-Length that promises bytes the
stream no longer holds DROPS the remainder of that shard — emitting
a partial record would understate content silently.

Scale / honest memory note: like the tar source, ``binaryFile``
materializes the whole shard blob per task and the inflated stream
adds ~3-4x (crawl text compresses ~3:1), so peak per-task memory is
~4-5x shard size; Common Crawl's ~1 GB shards need fat executors —
re-shard to 100-256 MB when you control the layout.  For shards you
control, the sink's optional SIDECAR MEMBER INDEX
(``write_index=True`` -> ``shard.warc.gz.idx``, one
``member_idx\\toffset\\tclen`` line per gzip member) lifts that
bound: ``read_warc_shards_indexed`` plans member-range splits from
the tiny index files and each task reads+inflates only its
~``target_split_bytes`` range, so peak per-task memory is ~5x the
SPLIT size regardless of shard size (a 1 GB shard parses in 64 MB
bites), and intra-shard parallelism = splits, not 1.
"""

from __future__ import annotations

import io
import gzip
import os
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_RECORD_SCHEMA = (
    "shard string, record_idx long, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_length long, "
    "payload binary"
)

def _gunzip_members(blob: bytes) -> bytes:
    """Inflate a chain of gzip members; a truncated final member is
    dropped whole (never a partial inflate)."""
    out = bytearray()
    while blob:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            piece = d.decompress(blob) + d.flush()
        except zlib.error:
            break
        if not d.eof:  # truncated member: drop it entirely
            break
        out += piece
        blob = d.unused_data
    return bytes(out)


def parse_warc_records(data: bytes) -> list[dict]:
    """Pure WARC record walk over an inflated stream (the unit
    ``read_warc_shards`` maps over shards): returns a list of
    {warc_type, record_id, target_uri, warc_date, content_length,
    payload} dicts.  Header names are case-insensitive; records
    missing Content-Length, and everything after the first malformed
    or truncated record, are dropped.  Module-level so property tests
    can fuzz framing directly — arbitrary bytes never raise."""
    out: list[dict] = []
    i = 0
    while i < len(data):
        while data[i : i + 2] == b"\r\n":
            i += 2
        if i >= len(data):
            break
        if not data.startswith(b"WARC/", i):
            break  # lost sync: drop the remainder
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            break
        fields: dict[str, str] = {}
        head = data[i:hdr_end].decode("utf-8", "replace")
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            break
        pstart = hdr_end + 4
        if clen < 0 or pstart + clen > len(data):
            break  # truncated payload: drop, don't understate
        out.append(
            {
                "warc_type": fields.get("warc-type", ""),
                "record_id": fields.get("warc-record-id", ""),
                "target_uri": fields.get("warc-target-uri", ""),
                "warc_date": fields.get("warc-date", ""),
                "content_length": clen,
                "payload": data[pstart : pstart + clen],
            }
        )
        i = pstart + clen
    return out


def _render_record(
    wtype: str, rid: str, uri: str, date: str, blob: bytes
) -> bytes:
    """Render one WARC record (the unit ``write_warc_shards`` emits).
    Header VALUES are sanitized — CR/LF/NUL become spaces — because an
    unsanitized value containing CRLF would corrupt the record framing
    for every subsequent record in the shard (the spec forbids bare
    CRLF in field values); the payload is framed by Content-Length and
    needs no escaping."""

    def clean(s: str) -> str:
        return str(s).translate({0x0D: " ", 0x0A: " ", 0x00: " "})

    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {clean(wtype)}\r\n"
        f"WARC-Record-ID: {clean(rid)}\r\n"
        f"WARC-Target-URI: {clean(uri)}\r\n"
        f"WARC-Date: {clean(date)}\r\n"
        f"Content-Length: {len(blob)}\r\n\r\n"
    ).encode()
    return head + blob + b"\r\n\r\n"


def read_warc_shards(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per WARC record across every shard matching
    ``path_glob``: (shard, record_idx, warc_type, record_id,
    target_uri, warc_date, content_length, payload).

    ``record_idx`` is the record's position within its shard (the
    member order).  Header names are case-insensitive per the spec;
    records missing Content-Length, and everything after the first
    malformed or truncated record, are dropped.
    """
    from mapreduceimpl_spark.sources.shardindex import local_path

    shards = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                out: dict[str, list] = {
                    "shard": [], "record_idx": [], "warc_type": [],
                    "record_id": [], "target_uri": [], "warc_date": [],
                    "content_length": [], "payload": [],
                }
                recs = parse_warc_records(_gunzip_members(bytes(blob)))
                for idx, r in enumerate(recs):
                    # local filesystem path, NOT the binaryFile URI:
                    # one shard-id form across both readers AND the
                    # sink manifest, so joins on `shard` line up
                    out["shard"].append(local_path(path))
                    out["record_idx"].append(idx)
                    for k, v in r.items():
                        out[k].append(v)
                yield pd.DataFrame(out)

    return shards.select("path", "content").mapInPandas(parse, WARC_RECORD_SCHEMA)


def read_warc_shards_indexed(
    spark: SparkSession,
    path_glob: str,
    target_split_bytes: int = 64 << 20,
) -> DataFrame:
    """Index-driven WARC reader for shards written with
    ``write_warc_shards(..., write_index=True)``: plans MEMBER-RANGE
    splits from the ``*.warc.gz.idx`` sidecars, so a shard parses in
    parallel ~``target_split_bytes`` bites instead of one whole-blob
    task — peak per-task memory ~5x the split size (compressed range
    + ~4x inflate), independent of shard size.

    Same output contract as :func:`read_warc_shards`.  ``record_idx``
    is the member index from the sidecar (the sink's member-per-record
    layout makes member == record; that layout is the only producer
    of sidecars).  LOCAL/SHARED FILESYSTEM ONLY, like the sinks —
    tasks open the shard path and ``seek`` to their range (on an
    object store this becomes a range request).

    Plan shape: the index lines are METADATA (one tiny row per gzip
    member), so the split-planning window/groupBy shuffles only
    index rows, never payload bytes; the payload pass itself is one
    seek+read per split with no shuffle.
    """
    from mapreduceimpl_spark.sources.shardindex import (
        assert_index_coverage,
        local_path,
        plan_member_splits,
    )

    assert_index_coverage(spark, path_glob)
    splits = plan_member_splits(spark, path_glob, target_split_bytes)

    def read_splits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for shard, start, length, first in zip(
                pdf["shard"], pdf["start"], pdf["length"], pdf["first_member"]
            ):
                local = local_path(shard)
                with open(local, "rb") as fh:
                    fh.seek(int(start))
                    blob = fh.read(int(length))
                out: dict[str, list] = {
                    "shard": [], "record_idx": [], "warc_type": [],
                    "record_id": [], "target_uri": [], "warc_date": [],
                    "content_length": [], "payload": [],
                }
                recs = parse_warc_records(_gunzip_members(blob))
                for idx, r in enumerate(recs):
                    out["shard"].append(local)
                    out["record_idx"].append(int(first) + idx)
                    for k, v in r.items():
                        out[k].append(v)
                yield pd.DataFrame(out)

    return splits.mapInPandas(read_splits, WARC_RECORD_SCHEMA)


def warc_conversion_text(records: DataFrame) -> DataFrame:
    """WET extraction: the plain-text payloads of ``conversion``
    records, decoded as UTF-8 — (shard, record_idx, record_id,
    target_uri, warc_date, content_length, text).  Pure codegen
    (filter + decode), no Python."""
    return records.filter(F.col("warc_type") == "conversion").select(
        "shard", "record_idx", "record_id", "target_uri", "warc_date",
        "content_length", F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


WARC_MANIFEST_SCHEMA = "shard string, n_records long, n_bytes long"


def write_warc_shards(
    records: DataFrame,
    out_dir: str,
    shard_col: str = "shard_id",
    warc_type_col: str = "warc_type",
    record_id_col: str = "record_id",
    uri_col: str = "target_uri",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    write_index: bool = False,
) -> DataFrame:
    """Distributed WARC sink, one ``shard-NNNNN.warc.gz`` per
    ``shard_col`` value in the Common Crawl member-per-record layout
    (each record its own gzip member, mtime pinned to 0), records
    sorted by (record_id) within the shard — shard bytes are a pure
    function of their contents AND the zlib build, so re-running the
    sink on the same runtime reproduces identical files (across zlib
    versions the deflate bytes may differ while the decoded records
    stay identical — unlike the tar sink, whose uncompressed bytes
    are version-independent).  Returns the lazy manifest (shard, n_records,
    n_bytes-uncompressed); run an action to perform the write.

    ``write_index=True`` also publishes a ``<shard>.idx`` sidecar —
    one ``member_idx\\toffset\\tclen`` line per gzip member — AFTER
    the shard itself (so a visible index always describes a complete
    shard); :func:`read_warc_shards_indexed` uses it for member-range
    splits that bound per-task memory by split size, not shard size.

    Scale: one keyed Exchange on the shard id, then each shard is
    streamed record-by-record by its group's task.  LOCAL/SHARED
    FILESYSTEM ONLY (the ``write_tar_shards`` contract): on an object
    store, swap the file write for an upload.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        os.makedirs(out_dir, exist_ok=True)
        shard_id = int(pdf[shard_col].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard_id:05d}.warc.gz")
        pdf = pdf.sort_values([record_id_col], ignore_index=True)
        n_bytes = 0
        offset = 0
        index_lines: list[str] = []
        # attempt-unique tmp: a speculative/retried attempt for the
        # same shard must never interleave into a sibling's tmp file —
        # the last os.replace wins and both attempts wrote complete
        # bytes.  taskAttemptId-keyed (pid alone is per-host only);
        # orphans from killed attempts are invisible to readers and
        # swept after the next successful publish.
        from mapreduceimpl_spark.sources.shardindex import (
            attempt_token,
            sweep_stale_tmps,
        )

        tmp = f"{path}.inprogress.{attempt_token()}"
        with open(tmp, "wb") as fh:
            for m_idx, (wtype, rid, uri, date, payload) in enumerate(zip(
                pdf[warc_type_col], pdf[record_id_col], pdf[uri_col],
                pdf[date_col], pdf[payload_col],
            )):
                rec = _render_record(wtype, rid, uri, date, bytes(payload))
                member = io.BytesIO()
                with gzip.GzipFile(
                    fileobj=member, mode="wb", compresslevel=6, mtime=0
                ) as gz:
                    gz.write(rec)
                mb = member.getvalue()
                fh.write(mb)
                index_lines.append(f"{m_idx}\t{offset}\t{len(mb)}\n")
                offset += len(mb)
                n_bytes += len(rec)  # header + payload + record separator
        # a stale sidecar from a previous run must NEVER describe the
        # new bytes (the indexed reader would seek wrong offsets and
        # silently drop records) — remove it BEFORE publishing, so
        # every crash window leaves either old-shard+old-idx or
        # new-shard+no-idx, both safe (assert_index_coverage catches
        # the no-idx state loudly)
        try:
            os.remove(path + ".idx")
        except FileNotFoundError:
            pass
        os.replace(tmp, path)  # atomic publish
        if write_index:
            # published AFTER the shard: an existing index always
            # describes a complete shard
            itmp = f"{path}.idx.inprogress.{attempt_token()}"
            with open(itmp, "w") as ih:
                ih.writelines(index_lines)
            os.replace(itmp, path + ".idx")
        sweep_stale_tmps(path)
        return pd.DataFrame(
            {"shard": [path], "n_records": [len(pdf)], "n_bytes": [n_bytes]}
        )

    return records.groupBy(shard_col).applyInPandas(
        write_group, WARC_MANIFEST_SCHEMA
    )
