"""WARC source/sink: member-per-record gzip shards (Common Crawl
layout), single-stream shards, WET text extraction, truncation drops,
and deterministic sink bytes."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from mapreduceimpl_spark.sources.warc import (
    read_warc_shards,
    read_warc_shards_indexed,
    warc_conversion_text,
    write_warc_shards,
)


def _record_bytes(wtype, rid, uri, payload, date="2024-01-01T00:00:00Z"):
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def test_read_member_per_record_and_single_stream(spark, tmp_path):
    """Both legal gzip layouts parse identically: shard A has one gzip
    member per record (Common Crawl), shard B is one deflate stream
    holding the same concatenation; payloads containing the record
    separator bytes must round-trip exactly (Content-Length framing,
    not delimiter scanning)."""
    d = tmp_path / "warc"
    d.mkdir()
    tricky = b"body with \r\n\r\nWARC/1.0\r\n embedded and \x00 bytes"
    recs = [
        _record_bytes("response", "<urn:a>", "https://x/1", tricky),
        _record_bytes("conversion", "<urn:b>", "https://x/2", b""),
        _record_bytes("conversion", "<urn:c>", "https://x/3", "héllo".encode()),
    ]
    (d / "a.warc.gz").write_bytes(
        b"".join(gzip.compress(r, mtime=0) for r in recs)
    )
    (d / "b.warc.gz").write_bytes(gzip.compress(b"".join(recs), mtime=0))

    rows = read_warc_shards(spark, f"{d}/*.warc.gz").collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"].rsplit("/", 1)[-1], []).append(r)
    assert set(by_shard) == {"a.warc.gz", "b.warc.gz"}
    for shard, got in by_shard.items():
        got.sort(key=lambda r: r["record_idx"])
        assert [r["record_idx"] for r in got] == [0, 1, 2]
        assert [r["warc_type"] for r in got] == [
            "response", "conversion", "conversion",
        ]
        assert bytes(got[0]["payload"]) == tricky
        assert got[0]["content_length"] == len(tricky)
        assert bytes(got[1]["payload"]) == b""
        assert bytes(got[2]["payload"]) == "héllo".encode()
        assert got[2]["target_uri"] == "https://x/3"
        assert got[2]["warc_date"] == "2024-01-01T00:00:00Z"


def test_read_drops_truncated_tail_not_whole_shard(spark, tmp_path):
    """A record whose Content-Length promises bytes the stream no
    longer holds drops the REMAINDER (itself included); complete
    records before it survive.  A truncated gzip member likewise
    drops only that member's records."""
    d = tmp_path / "warc"
    d.mkdir()
    good = _record_bytes("conversion", "<urn:a>", "https://x/1", b"keep me")
    cut = _record_bytes("conversion", "<urn:b>", "https://x/2", b"gone")[:-8]
    (d / "t.warc.gz").write_bytes(
        gzip.compress(good, mtime=0) + gzip.compress(cut, mtime=0)
    )
    # shard whose SECOND gzip member is cut mid-stream
    m1 = gzip.compress(good, mtime=0)
    m2 = gzip.compress(
        _record_bytes("conversion", "<urn:c>", "https://x/3", b"x" * 4096),
        mtime=0,
    )
    (d / "g.warc.gz").write_bytes(m1 + m2[: len(m2) // 2])

    rows = read_warc_shards(spark, f"{d}/*.warc.gz").collect()
    got = {(r["shard"].rsplit("/", 1)[-1], r["record_id"]) for r in rows}
    assert got == {("t.warc.gz", "<urn:a>"), ("g.warc.gz", "<urn:a>")}
    assert all(bytes(r["payload"]) == b"keep me" for r in rows)


def test_write_read_roundtrip_and_wet_extract(spark, tmp_path):
    """Sink -> source round-trip: 20 records across 3 shards come back
    byte-exact with their headers, and warc_conversion_text recovers
    the UTF-8 text of conversion records only."""
    out = tmp_path / "sink"
    rows = [
        (
            i % 3,
            "conversion" if i % 4 else "response",
            f"<urn:doc:{i:04d}>",
            f"https://example.com/doc/{i}",
            "2024-01-01T00:00:00Z",
            bytearray(f"text {i} — π={i * i}".encode()),
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "shard_id long, warc_type string, record_id string, "
        "target_uri string, warc_date string, payload binary",
    )
    manifest = write_warc_shards(df, str(out)).collect()
    assert len(manifest) == 3
    assert sum(m["n_records"] for m in manifest) == 20

    back = read_warc_shards(spark, f"{out}/*.warc.gz")
    got = {r["record_id"]: r for r in back.collect()}
    assert len(got) == 20
    for i in range(20):
        r = got[f"<urn:doc:{i:04d}>"]
        assert bytes(r["payload"]) == f"text {i} — π={i * i}".encode()
        assert r["target_uri"] == f"https://example.com/doc/{i}"
        assert r["warc_type"] == ("conversion" if i % 4 else "response")

    wet = warc_conversion_text(back)
    texts = {r["record_id"]: r["text"] for r in wet.collect()}
    assert len(texts) == 15  # i % 4 != 0
    assert texts["<urn:doc:0001>"] == "text 1 — π=1"


def test_write_warc_shards_deterministic_bytes(spark, tmp_path):
    """Re-running the sink reproduces IDENTICAL shard files (mtime
    pinned, records sorted by record_id): content-addressed stores
    dedup re-runs."""
    df = spark.createDataFrame(
        [(0, "conversion", f"<urn:{i}>", f"https://x/{i}",
          "2024-01-01T00:00:00Z", bytearray(f"payload {i}".encode()))
         for i in (3, 1, 2)],
        "shard_id long, warc_type string, record_id string, "
        "target_uri string, warc_date string, payload binary",
    )
    a, b = tmp_path / "a", tmp_path / "b"
    write_warc_shards(df, str(a)).collect()
    write_warc_shards(df.orderBy(F.rand(7)), str(b)).collect()
    fa = (a / "shard-00000.warc.gz").read_bytes()
    fb = (b / "shard-00000.warc.gz").read_bytes()
    assert fa == fb and len(fa) > 0


def test_indexed_read_matches_whole_shard_read(spark, tmp_path):
    """VERDICT r7 #6: with ``write_index=True`` the sink publishes a
    member-offset sidecar, and ``read_warc_shards_indexed`` must
    recover EXACTLY what the whole-shard reader sees — same ids,
    record_idx, headers, byte-exact payloads — while planning
    multiple byte-range splits per shard (target_split_bytes smaller
    than one member forces one split PER member, the maximal
    re-shard), bounding per-task memory by split size."""
    out = tmp_path / "sink"
    rows = [
        (
            i % 2,
            "conversion" if i % 3 else "response",
            f"<urn:doc:{i:04d}>",
            f"https://example.com/doc/{i}",
            "2024-01-01T00:00:00Z",
            bytearray(f"text {i} — π={i * i} ".encode() * (1 + i % 5)),
        )
        for i in range(14)
    ]
    df = spark.createDataFrame(
        rows,
        "shard_id long, warc_type string, record_id string, "
        "target_uri string, warc_date string, payload binary",
    )
    write_warc_shards(df, str(out), write_index=True).collect()
    idx_files = sorted(out.glob("*.warc.gz.idx"))
    assert len(idx_files) == 2
    # sidecar lines describe contiguous ranges covering the shard
    for idx in idx_files:
        shard_len = (out / idx.name[: -len(".idx")]).stat().st_size
        pos = 0
        for line in idx.read_text().splitlines():
            m, off, clen = (int(x) for x in line.split("\t"))
            assert off == pos
            pos += clen
        assert pos == shard_len

    # FULL shard paths (not basenames): both readers and the sink
    # manifest must agree on one shard-id form (review r8) — whole
    # reader, indexed reader, and the .warc.gz files on disk
    whole = {
        (r["shard"], r["record_idx"]): (
            r["record_id"], r["warc_type"], r["target_uri"],
            r["warc_date"], r["content_length"], bytes(r["payload"]),
        )
        for r in read_warc_shards(spark, f"{out}/*.warc.gz").collect()
    }
    disk_shards = {str(p) for p in out.glob("*.warc.gz")}
    assert {s for s, _ in whole} == disk_shards
    for target in (1, 10**9):  # one-split-per-member AND one-per-shard
        ranged = {
            (r["shard"], r["record_idx"]): (
                r["record_id"], r["warc_type"], r["target_uri"],
                r["warc_date"], r["content_length"], bytes(r["payload"]),
            )
            for r in read_warc_shards_indexed(
                spark, f"{out}/*.warc.gz", target_split_bytes=target
            ).collect()
        }
        assert ranged == whole and len(ranged) == 14
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_warc_shards_indexed(spark, f"{out}/*.warc.gz", target_split_bytes=0)

    # partial sidecar coverage must fail LOUDLY, not silently return a
    # subset (review r8): delete one shard's index
    idx_files[0].unlink()
    with _pytest.raises(ValueError, match="no .idx sidecar"):
        read_warc_shards_indexed(spark, f"{out}/*.warc.gz")

    # re-writing the same dir WITHOUT the index must remove the stale
    # sidecars — an old index describing new bytes would silently
    # corrupt the indexed read (review r8)
    write_warc_shards(df, str(out)).collect()
    assert list(out.glob("*.idx")) == []
    with _pytest.raises(ValueError, match="no .idx sidecar"):
        read_warc_shards_indexed(spark, f"{out}/*.warc.gz")


def test_build_shard_indexes_matches_sink_index_gzip(spark, tmp_path):
    """The offline index BUILDER (for shards you did NOT write — real
    Common Crawl files) must reproduce the sink's own sidecar
    byte-for-byte: same member extents from walking the gzip chain.
    After building, the indexed reader sees exactly the whole-shard
    truth."""
    from mapreduceimpl_spark.sources.shardindex import build_shard_indexes

    rows = [
        (i % 2, "conversion", f"<urn:doc:{i:04d}>", f"https://x/{i}",
         "2024-01-01T00:00:00Z", bytearray(f"payload {i} " .encode() * (3 + i)))
        for i in range(8)
    ]
    schema = ("shard_id long, warc_type string, record_id string, "
              "target_uri string, warc_date string, payload binary")
    df = spark.createDataFrame(rows, schema)
    a, b = tmp_path / "with_idx", tmp_path / "built_idx"
    write_warc_shards(df, str(a), write_index=True).collect()
    write_warc_shards(df, str(b)).collect()
    assert list(b.glob("*.idx")) == []
    manifest = build_shard_indexes(spark, f"{b}/*.warc.gz", kind="gzip").collect()
    assert sum(m["n_members"] for m in manifest) == 8
    for idx in sorted(a.glob("*.idx")):
        assert idx.read_text() == (b / idx.name).read_text()

    whole = {
        (r["shard"].rsplit("/", 1)[-1], r["record_id"]): bytes(r["payload"])
        for r in read_warc_shards(spark, f"{b}/*.warc.gz").collect()
    }
    ranged = {
        (r["shard"].rsplit("/", 1)[-1], r["record_id"]): bytes(r["payload"])
        for r in read_warc_shards_indexed(
            spark, f"{b}/*.warc.gz", target_split_bytes=1
        ).collect()
    }
    assert ranged == whole and len(ranged) == 8


def test_warc_read_plan_is_shuffle_free(spark, tmp_path):
    """The read path is binaryFile -> one Arrow map stage: no Exchange
    — at 100 TB the scan cost is one pass per shard, parallelism =
    shard count."""
    from mapreduceimpl_spark.plans import explain_str

    d = tmp_path / "warc"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(
        gzip.compress(_record_bytes("conversion", "<u>", "https://x", b"y"),
                      mtime=0)
    )
    df = warc_conversion_text(read_warc_shards(spark, f"{d}/*.warc.gz"))
    assert "Exchange" not in explain_str(df, "simple")


def test_orphan_inprogress_tmps_invisible_to_readers(spark, tmp_path):
    """A killed speculative attempt leaves ``*.inprogress.<pid>``
    orphans next to the shards (the sinks' pid-unique tmp names).
    Every reader path — whole-shard glob, indexed range read, its
    sidecar-coverage check — must see EXACTLY the published shards,
    never the orphans."""
    out = tmp_path / "sink"
    rows = [
        (i % 2, "conversion", f"<urn:doc:{i:04d}>",
         f"https://example.com/doc/{i}", "2024-01-01T00:00:00Z",
         bytearray(f"text {i}".encode()))
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows,
        "shard_id long, warc_type string, record_id string, "
        "target_uri string, warc_date string, payload binary",
    )
    write_warc_shards(df, str(out), write_index=True).collect()
    # plant orphans a dead attempt would leave: half-written shard
    # bytes and a half-written sidecar
    (out / "shard-00000.warc.gz.inprogress.99999").write_bytes(b"\x1f\x8b garbage")
    (out / "shard-00000.warc.gz.idx.inprogress.99999").write_text("0\t0\t1\n")

    whole = read_warc_shards(spark, f"{out}/*.warc.gz")
    assert whole.select("shard").distinct().count() == 2
    assert whole.count() == 8
    ranged = read_warc_shards_indexed(
        spark, f"{out}/*.warc.gz", target_split_bytes=1
    )
    assert ranged.count() == 8
