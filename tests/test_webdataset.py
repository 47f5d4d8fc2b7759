"""WebDataset tar-shard source: member extraction, sample grouping,
and the handoff into the multimodal probe."""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F

from mapreduceimpl_spark.sources.webdataset import group_samples, read_tar_shards
from tests.test_multimodal import _minimal_png, _wav_bytes


def _write_shard(path, members):
    with tarfile.open(path, "w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))


def _make_shards(tmp_path):
    d = tmp_path / "wds"
    d.mkdir()
    _write_shard(
        d / "shard-000.tar",
        [
            ("000000.png", _minimal_png(320, 200)),
            ("000000.txt", b"a caption"),
            ("000001.png", _minimal_png(64, 64)),
            ("000001.txt", b"another caption"),
        ],
    )
    # shard-001 includes a directory member, which must be skipped
    with tarfile.open(d / "shard-001.tar", "w") as tf:
        for name, payload in [
            ("000002.wav", _wav_bytes(rate=16000, channels=1, n_samples=16000)),
            ("000002.json", b'{"lang": "en"}'),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
        dinfo = tarfile.TarInfo("subdir")
        dinfo.type = tarfile.DIRTYPE
        tf.addfile(dinfo)
    return str(d)


def test_read_tar_shards_members(spark, tmp_path):
    members = read_tar_shards(spark, _make_shards(tmp_path) + "/*.tar").collect()
    by_member = {r["member"]: r for r in members}
    assert set(by_member) == {
        "000000.png", "000000.txt", "000001.png", "000001.txt",
        "000002.wav", "000002.json",
    }
    r = by_member["000000.png"]
    assert r["key"] == "000000" and r["ext"] == "png"
    assert r["n_bytes"] == len(bytes(r["payload"])) > 0
    assert bytes(by_member["000000.txt"]["payload"]) == b"a caption"
    # sample keys never cross shards
    assert by_member["000002.wav"]["shard"] != by_member["000000.png"]["shard"]


def test_group_samples_reassembles(spark, tmp_path):
    members = read_tar_shards(spark, _make_shards(tmp_path) + "/*.tar")
    samples = {r["key"]: r for r in group_samples(members).collect()}
    assert set(samples) == {"000000", "000001", "000002"}
    s0 = samples["000000"]
    assert s0["n_members"] == 2 and set(s0["parts"].keys()) == {"png", "txt"}
    assert bytes(s0["parts"]["txt"]) == b"a caption"
    assert samples["000002"]["n_members"] == 2


def test_shard_members_feed_media_probe(spark, tmp_path):
    """The payload column plugs straight into probe_media: PNG and WAV
    members classify with their real header metadata."""
    from mapreduceimpl_spark.operators.multimodal import probe_media

    members = read_tar_shards(spark, _make_shards(tmp_path) + "/*.tar")
    # probe_media wants a LONG asset id; derive one from the member name
    assets = members.select(F.xxhash64("member").alias("asset_id"), "payload")
    ids = {
        r["member"]: r["asset_id"]
        for r in members.select(
            "member", F.xxhash64("member").alias("asset_id")
        ).collect()
    }
    probed = {r["asset_id"]: r for r in probe_media(assets).collect()}
    png = probed[ids["000000.png"]]
    assert png["media"] == "image" and (png["width"], png["height"]) == (320, 200)
    wav = probed[ids["000002.wav"]]
    assert wav["media"] == "audio" and wav["sample_rate"] == 16000
    assert probed[ids["000000.txt"]]["media"] == "unknown"


def test_write_tar_shards_roundtrip(spark, tmp_path):
    """Distributed sink inverse of read_tar_shards: every member
    survives a write -> read roundtrip byte-exactly, grouped into the
    caller's shard assignment."""
    from mapreduceimpl_spark.sources.webdataset import write_tar_shards

    rows = [
        (i % 3, f"{i:06d}", "png" if i % 2 else "txt", bytes([i % 251] * (10 + i)))
        for i in range(12)
    ]
    members = spark.createDataFrame(rows, ["shard_id", "key", "ext", "payload"])
    out = str(tmp_path / "wds_out")
    manifest = {r["shard"]: r for r in write_tar_shards(members, out).collect()}
    assert len(manifest) == 3
    assert sum(r["n_members"] for r in manifest.values()) == 12

    back = read_tar_shards(spark, out + "/*.tar").collect()
    got = {(r["key"], r["ext"]): bytes(r["payload"]) for r in back}
    want = {(k, e): p for _, k, e, p in rows}
    assert got == want


def test_write_tar_shards_deterministic_bytes(spark, tmp_path):
    """Shard bytes are a pure function of contents: re-running the
    sink (even from a different input ordering) reproduces identical
    files — zeroed tar metadata + (key, ext) member sort."""
    from mapreduceimpl_spark.sources.webdataset import write_tar_shards

    rows = [(0, f"{i:06d}", "bin", bytes([i] * 64)) for i in range(8)]
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    write_tar_shards(spark.createDataFrame(rows, ["shard_id", "key", "ext", "payload"]), a_dir).collect()
    write_tar_shards(
        spark.createDataFrame(rows[::-1], ["shard_id", "key", "ext", "payload"]).repartition(4),
        b_dir,
    ).collect()
    a = (tmp_path / "a" / "shard-00000.tar").read_bytes()
    b = (tmp_path / "b" / "shard-00000.tar").read_bytes()
    assert a == b and len(a) > 0


def test_indexed_tar_read_matches_whole_shard_read(spark, tmp_path):
    """Tar sibling of the WARC member index (VERDICT r7 #6): with
    ``write_index=True`` the sink publishes a header-offset sidecar,
    and ``read_tar_shards_indexed`` must recover EXACTLY what the
    whole-shard reader sees — byte-exact payloads, keys, exts — while
    planning multiple byte-range splits per shard (target smaller
    than one member forces one split PER member).  Sidecar ranges are
    contiguous and land on 512-byte header boundaries."""
    from mapreduceimpl_spark.sources.webdataset import (
        read_tar_shards_indexed,
        write_tar_shards,
    )

    rows = [
        (i % 2, f"{i:06d}", "png" if i % 2 else "txt",
         bytes([i % 251] * (100 + 97 * i)))
        for i in range(10)
    ]
    members = spark.createDataFrame(rows, ["shard_id", "key", "ext", "payload"])
    out = str(tmp_path / "wds_idx")
    write_tar_shards(members, out, write_index=True).collect()
    idx_files = sorted((tmp_path / "wds_idx").glob("*.tar.idx"))
    assert len(idx_files) == 2
    for idx in idx_files:
        pos = 0
        for line in idx.read_text().splitlines():
            m, off, length = (int(x) for x in line.split("\t"))
            assert off == pos and off % 512 == 0
            pos += length
        # shard = members + 1024B end-of-archive (+ blocking padding)
        shard_len = (tmp_path / "wds_idx" / idx.name[:-4]).stat().st_size
        assert pos + 1024 <= shard_len

    # FULL shard paths: both readers and the sink manifest must agree
    # on one shard-id form (review r8)
    whole = {
        (r["shard"], r["key"], r["ext"]): bytes(r["payload"])
        for r in read_tar_shards(spark, out + "/*.tar").collect()
    }
    disk_shards = {str(p) for p in (tmp_path / "wds_idx").glob("*.tar")}
    assert {s for s, _, _ in whole} == disk_shards
    for target in (1, 10**9):  # one-split-per-member AND one-per-shard
        ranged = {
            (r["shard"], r["key"], r["ext"]): bytes(r["payload"])
            for r in read_tar_shards_indexed(
                spark, out + "/*.tar", target_split_bytes=target
            ).collect()
        }
        assert ranged == whole and len(ranged) == 10

    # stale-sidecar hygiene (review r8): re-writing without the index
    # removes old .idx files, and partial coverage fails loudly
    import pytest as _pytest

    write_tar_shards(members, out).collect()
    assert list((tmp_path / "wds_idx").glob("*.idx")) == []
    with _pytest.raises(ValueError, match="no .idx sidecar"):
        read_tar_shards_indexed(spark, out + "/*.tar")


def test_build_shard_indexes_matches_sink_index_tar(spark, tmp_path):
    """Tar sibling of the gzip index builder: building sidecars for
    externally-produced tar shards reproduces the sink's own index
    byte-for-byte (header-parse extents == write-position extents),
    and the indexed read then equals the whole-shard read."""
    from mapreduceimpl_spark.sources.shardindex import build_shard_indexes
    from mapreduceimpl_spark.sources.webdataset import (
        read_tar_shards_indexed,
        write_tar_shards,
    )

    rows = [(0, f"{i:06d}", "bin", bytes([i % 251] * (40 + 70 * i)))
            for i in range(6)]
    members = spark.createDataFrame(rows, ["shard_id", "key", "ext", "payload"])
    a, b = tmp_path / "with_idx", tmp_path / "built_idx"
    write_tar_shards(members, str(a), write_index=True).collect()
    write_tar_shards(members, str(b)).collect()
    manifest = build_shard_indexes(spark, f"{b}/*.tar", kind="tar").collect()
    assert sum(m["n_members"] for m in manifest) == 6
    for idx in sorted(a.glob("*.idx")):
        assert idx.read_text() == (b / idx.name).read_text()

    whole = {
        (r["key"], r["ext"]): bytes(r["payload"])
        for r in read_tar_shards(spark, f"{b}/*.tar").collect()
    }
    ranged = {
        (r["key"], r["ext"]): bytes(r["payload"])
        for r in read_tar_shards_indexed(
            spark, f"{b}/*.tar", target_split_bytes=1
        ).collect()
    }
    assert ranged == whole and len(ranged) == 6

    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_shard_indexes(spark, f"{b}/*.tar", kind="zip")


def test_read_tar_shards_drops_corrupt_shard_not_the_job(spark, tmp_path):
    """Drop-don't-crash: a non-tar shard and a mid-archive-corrupted
    shard must not fail the read — the good shard's members all come
    back, the corrupt shard keeps only the members walked before the
    damage (here: truncation after the first member)."""
    d = tmp_path / "wds_bad"
    d.mkdir()
    _write_shard(
        d / "good.tar",
        [("000000.txt", b"alpha"), ("000001.txt", b"beta")],
    )
    (d / "junk.tar").write_bytes(b"this is not a tar archive at all")
    _write_shard(
        d / "cut.tar",
        [("000002.txt", b"gamma"), ("000003.txt", b"delta")],
    )
    whole = (d / "cut.tar").read_bytes()
    # keep header(512) + payload block(512) of member 1, cut inside
    # member 2's header so the walk dies mid-archive
    (d / "cut.tar").write_bytes(whole[: 512 + 512 + 100])

    rows = read_tar_shards(spark, f"{d}/*.tar").collect()
    got = {(r["shard"].rsplit("/", 1)[-1], r["member"]) for r in rows}
    assert ("good.tar", "000000.txt") in got
    assert ("good.tar", "000001.txt") in got
    assert ("cut.tar", "000002.txt") in got          # walked before the cut
    assert all(s != "junk.tar" for s, _ in got)      # non-tar: zero rows
    assert ("cut.tar", "000003.txt") not in got      # dropped remainder


def test_orphan_inprogress_tmps_invisible_to_readers(spark, tmp_path):
    """Tar sibling of the WARC orphan test: ``*.inprogress.<pid>``
    leftovers from a killed attempt must be invisible to the
    whole-shard and indexed readers."""
    from mapreduceimpl_spark.sources.webdataset import (
        read_tar_shards,
        read_tar_shards_indexed,
        write_tar_shards,
    )

    rows = [(i % 2, f"{i:06d}", "txt", bytes([65 + i] * 50)) for i in range(6)]
    members = spark.createDataFrame(rows, ["shard_id", "key", "ext", "payload"])
    out = tmp_path / "wds"
    write_tar_shards(members, str(out), write_index=True).collect()
    (out / "shard-00000.tar.inprogress.99999").write_bytes(b"\x00" * 512)
    (out / "shard-00000.tar.idx.inprogress.99999").write_text("0\t0\t512\n")

    whole = read_tar_shards(spark, f"{out}/*.tar")
    assert whole.select("shard").distinct().count() == 2
    assert whole.count() == 6
    ranged = read_tar_shards_indexed(spark, f"{out}/*.tar", target_split_bytes=1)
    assert ranged.count() == 6


def test_publish_sweeps_orphans_even_in_glob_metachar_dirs(spark, tmp_path):
    """A successful publish removes dead attempts' leftovers, and the
    sweep is prefix-matched (not glob): an output directory containing
    glob metacharacters must neither miss its own orphans nor touch a
    SIBLING shard's files.  The sweep is also age-gated (ADVICE r8):
    a tmp younger than the grace window is a possibly-LIVE speculative
    sibling attempt mid-write — deleting it would turn a benign
    duplicate into a FileNotFoundError task failure."""
    import os
    import time

    from mapreduceimpl_spark.sources.shardindex import SWEEP_GRACE_SECONDS
    from mapreduceimpl_spark.sources.webdataset import write_tar_shards

    rows = [(0, "000000", "txt", b"x" * 64), (1, "000001", "txt", b"y" * 64)]
    members = spark.createDataFrame(rows, ["shard_id", "key", "ext", "payload"])
    out = tmp_path / "batch[01]"  # glob would parse [01] as a class
    out.mkdir()
    orphan = out / "shard-00000.tar.inprogress.d.dead.999"
    livetmp = out / "shard-00000.tar.inprogress.d.live2.777"
    sibling = out / "shard-00001x.tar.inprogress.d.live.888"
    orphan.write_bytes(b"\x00" * 128)
    livetmp.write_bytes(b"\x00" * 128)  # fresh mtime: a live attempt
    sibling.write_bytes(b"\x00" * 128)  # different shard prefix: keep
    # age the orphan past the grace window (dead attempts stop aging)
    stale = time.time() - SWEEP_GRACE_SECONDS - 60
    os.utime(orphan, (stale, stale))
    write_tar_shards(members, str(out)).collect()
    assert not orphan.exists()      # swept by shard-00000's publish
    assert livetmp.exists()         # same prefix but young: grace-kept
    assert sibling.exists()         # never another shard's tmp
    assert (out / "shard-00000.tar").exists()
