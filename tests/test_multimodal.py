"""Multimodal binary-column pipeline: real plumbing, stubbed decode."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mapreduceimpl_spark.operators import multimodal


def test_strict_decode_is_honest_stub(docs):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(multimodal.to_binary_assets(docs), strict=True)


def test_payload_roundtrip_and_schema(docs):
    meta = multimodal.multimodal_meta(docs)
    assert [f.name for f in meta.schema.fields] == [
        "asset_id", "n_bytes", "content_sha", "width", "height", "format",
        "header_parsed",
    ]
    rows = {r["asset_id"]: r for r in meta.collect()}
    sample = docs.limit(5).collect()
    for doc in sample:
        r = rows[doc["doc_id"]]
        payload = doc["text"].encode("utf-8")
        assert r["n_bytes"] == len(payload)
        assert r["content_sha"] == hashlib.sha256(payload).hexdigest()
        assert 16 <= r["width"] < 256 and 16 <= r["height"] < 256
        assert r["format"] in ("png", "jpeg", "webp")


def test_decode_deterministic(docs):
    m1 = multimodal.multimodal_meta(docs)
    m2 = multimodal.multimodal_meta(docs)
    assert m1.exceptAll(m2).count() == 0


def test_resize_geometry(docs):
    decoded = multimodal.multimodal_meta(docs)
    resized = multimodal.resize_stub(decoded, max_side=64)
    rows = resized.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert max(r["target_w"], r["target_h"]) <= 64
        assert 0 < r["scale"] <= 1.0
        # aspect ratio preserved within rounding
        if r["width"] >= r["height"]:
            assert r["target_w"] >= r["target_h"] - 1
        else:
            assert r["target_h"] >= r["target_w"] - 1


def test_frame_sample_expands_rows(docs):
    assets = multimodal.to_binary_assets(docs.limit(10))
    frames = multimodal.frame_sample_stub(assets, fps_out=2.0, duration_s=3.0)
    rows = frames.collect()
    assert len(rows) == 10 * 6
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r["asset_id"], []).append(r)
    for frs in per_asset.values():
        idxs = sorted(f["frame_idx"] for f in frs)
        assert idxs == list(range(6))
        assert len({f["frame_sha"] for f in frs}) == 6  # distinct per frame
        assert all(f["frame_ts_ms"] == f["frame_idx"] * 500 for f in frs)


def test_strict_stubs_raise(docs):
    import pytest as pt

    decoded = multimodal.multimodal_meta(docs)
    with pt.raises(NotImplementedError):
        multimodal.resize_stub(decoded, strict=True)
    with pt.raises(NotImplementedError):
        multimodal.frame_sample_stub(multimodal.to_binary_assets(docs), strict=True)


def test_binary_column_type(docs):
    assets = multimodal.to_binary_assets(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    n = assets.filter(F.length("payload") > 0).count()
    assert n == docs.count()


def _minimal_png(w, h):
    import struct, zlib

    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _minimal_jpeg(w, h):
    import struct

    # SOI + APP0 stub + SOF0 with height/width (APP0 length 16 =
    # 2 length bytes + 14 payload bytes)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def test_parse_image_header_real_formats():
    from mapreduceimpl_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_minimal_png(640, 480)) == (640, 480, "png")
    assert parse_image_header(_minimal_jpeg(320, 200)) == (320, 200, "jpeg")
    gif = b"GIF89a" + (100).to_bytes(2, "little") + (50).to_bytes(2, "little")
    assert parse_image_header(gif) == (100, 50, "gif")
    assert parse_image_header(b"just some text bytes") is None


def test_decode_uses_real_header_when_present(spark):
    """A genuine PNG payload in the asset stream gets its TRUE
    dimensions from the header parser; text payloads fall back to the
    deterministic fake."""
    from mapreduceimpl_spark.operators import multimodal

    assets = spark.createDataFrame(
        [(1, bytearray(_minimal_png(800, 600))), (2, bytearray(b"plain text"))],
        "asset_id long, payload binary",
    )
    rows = {r["asset_id"]: r for r in multimodal.decode_image_stub(assets).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["format"]) == (800, 600, "png")
    assert rows[2]["width"] > 0  # fake path still deterministic


def test_parse_image_header_webp_layouts():
    """Lossy VP8 and lossless VP8L — the common WebP layouts without a
    VP8X extended header — parse too."""
    import struct

    from mapreduceimpl_spark.operators.multimodal import parse_image_header

    # lossy: RIFF..WEBP VP8 <len> [3B frame tag] 9d 01 2a [w16][h16]
    vp8 = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 14)
        + b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 1920, 1080) + b"\x00\x00"
    )
    assert parse_image_header(vp8) == (1920, 1080, "webp")

    # lossless: RIFF..WEBP VP8L <len> 2f [14b w-1 | 14b h-1 packed LE]
    bits = (639) | (479 << 14)
    vp8l = (
        b"RIFF" + struct.pack("<I", 20) + b"WEBP"
        + b"VP8L" + struct.pack("<I", 6)
        + b"\x2f" + struct.pack("<I", bits) + b"\x00"
    )
    assert parse_image_header(vp8l) == (640, 480, "webp")


def test_parse_image_header_jpeg_fill_bytes():
    """Legal 0xFF padding between JPEG segments must not derail the
    SOF scan."""
    import struct

    from mapreduceimpl_spark.operators.multimodal import parse_image_header

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof2 = b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 77, 99, 1) + b"\x01\x11\x00"
    jpeg = b"\xff\xd8" + app0 + b"\xff\xff\xff" + sof2  # progressive + fill
    assert parse_image_header(jpeg) == (99, 77, "jpeg")


def test_decode_flags_header_parsed(spark):
    from mapreduceimpl_spark.operators import multimodal

    assets = spark.createDataFrame(
        [(1, bytearray(_minimal_png(32, 16))), (2, bytearray(b"not an image"))],
        "asset_id long, payload binary",
    )
    rows = {r["asset_id"]: r for r in multimodal.decode_image_stub(assets).collect()}
    assert rows[1]["header_parsed"] is True
    assert rows[2]["header_parsed"] is False


def _wav_bytes(rate=44100, channels=2, bits=16, n_samples=44100):
    byte_rate = rate * channels * bits // 8
    data_size = n_samples * channels * bits // 8
    return (
        b"RIFF" + (36 + data_size).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
        + b"data" + data_size.to_bytes(4, "little")
    )


def _flac_bytes(rate=48000, channels=2, total=480000):
    info = bytearray(34)
    packed = (rate << 44) | ((channels - 1) << 41) | ((16 - 1) << 36) | total
    info[10:18] = packed.to_bytes(8, "big")
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(info)


def _ogg_bytes(rate=22050, channels=1):
    vorbis = (
        b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([channels])
        + rate.to_bytes(4, "little") + bytes(14)
    )
    return b"OggS" + bytes(22) + bytes([1]) + bytes([len(vorbis)]) + vorbis


def _mp4_bytes(dur_ms=5000, timescale=1000, width=640, height=360):
    def box(t, body):
        return (8 + len(body)).to_bytes(4, "big") + t + body

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    mvhd = box(
        b"mvhd",
        bytes(4) + bytes(8) + timescale.to_bytes(4, "big")
        + (dur_ms * timescale // 1000).to_bytes(4, "big") + bytes(80),
    )
    # v0 body: ver/flags(4) ctime/mtime/track_id(12) rsvd(4) duration(4)
    # rsvd(8) layer/alt/vol/rsvd(8) matrix(36) = 76, then 16.16 geometry
    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(12) + bytes(4) + bytes(4) + bytes(8) + bytes(8)
        + bytes(36)
        + (width << 16).to_bytes(4, "big") + (height << 16).to_bytes(4, "big"),
    )
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


def test_parse_audio_header_formats():
    assert multimodal.parse_audio_header(_wav_bytes(16000, 1, 16, 32000)) == (
        16000, 1, 2000, "wav",
    )
    assert multimodal.parse_audio_header(_flac_bytes(48000, 2, 96000)) == (
        48000, 2, 2000, "flac",
    )
    assert multimodal.parse_audio_header(_ogg_bytes(22050, 1)) == (
        22050, 1, -1, "ogg",
    )
    assert multimodal.parse_audio_header(b"not audio at all, just text") is None


def test_parse_audio_header_truncated_wav_fmt_rejected():
    """A WAV payload cut off INSIDE a trailing fmt chunk must be
    rejected, not parsed into zeros from short slices (ADVICE r3: the
    old guard covered reads through i+16 but byte_rate ends at i+20).

    A LIST filler chunk pushes fmt toward the end so the payload stays
    past the 44-byte container minimum while fmt itself is truncated."""
    filler = b"LIST" + (24).to_bytes(4, "little") + bytes(24)  # 12..44
    head = b"RIFF" + (200).to_bytes(4, "little") + b"WAVE" + filler
    fmt_full = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (16000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    # fmt starts at i=44; guard needs i+20 = 64 bytes total.  Cut the
    # payload so the fmt id+size survive (>=52) but byte_rate doesn't.
    for cut in (52, 56, 60, 63):
        payload = (head + fmt_full)[:cut]
        assert len(payload) >= 44
        assert multimodal.parse_audio_header(payload) is None
    # with all 20 guarded bytes present, rate/channels parse; no data
    # chunk so duration_ms = -1
    assert multimodal.parse_audio_header((head + fmt_full)[:64]) == (
        16000, 1, -1, "wav",
    )


def test_parse_video_header_mp4():
    got = multimodal.parse_video_header(_mp4_bytes(7500, 600, 1280, 720))
    assert got == (1280, 720, 7500, "mp4")
    assert multimodal.parse_video_header(b"RIFF....WAVE") is None


def test_probe_media_routes_mixed_payloads(spark):
    png = (
        b"\x89PNG\r\n\x1a\n" + bytes(8)
        + (320).to_bytes(4, "big") + (240).to_bytes(4, "big")
    )
    rows = spark.createDataFrame(
        [
            (1, bytearray(png)),
            (2, bytearray(_wav_bytes(8000, 1, 16, 8000))),
            (3, bytearray(_mp4_bytes(3000, 1000, 640, 360))),
            (4, bytearray(b"plain text payload")),
        ],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in multimodal.probe_media(rows).collect()}
    assert got[1]["media"] == "image" and (got[1]["width"], got[1]["height"]) == (320, 240)
    assert got[2]["media"] == "audio" and got[2]["sample_rate"] == 8000
    assert got[2]["duration_ms"] == 1000 and got[2]["channels"] == 1
    assert got[3]["media"] == "video" and got[3]["duration_ms"] == 3000
    assert (got[3]["width"], got[3]["height"]) == (640, 360)
    assert got[4]["media"] == "unknown" and not got[4]["header_parsed"]
    assert all(r["n_bytes"] > 0 for r in got.values())


def test_null_payload_and_text_do_not_crash(spark):
    """Null payloads probe as empty bytes (unknown, header_parsed
    False) and null text chunks as one empty chunk — neither silently
    drops rows nor crashes the Arrow batch."""
    from mapreduceimpl_spark.operators.text_analysis import chunk_documents

    assets = spark.createDataFrame(
        [(1, None), (2, bytearray(b"abc"))], "asset_id long, payload binary"
    )
    got = {r["asset_id"]: r for r in multimodal.probe_media(assets).collect()}
    assert got[1]["media"] == "unknown" and got[1]["n_bytes"] == 0
    meta = {r["asset_id"]: r for r in multimodal.decode_image_stub(assets).collect()}
    assert meta[1]["n_bytes"] == 0 and not meta[1]["header_parsed"]

    docs = spark.createDataFrame([(1, None), (2, "a b c")], "doc_id long, text string")
    chunks = chunk_documents(docs).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == ""
    assert len(by_doc[2]) == 1


def _bmp(w: int, h: int) -> bytes:
    # BITMAPINFOHEADER (DIB size 40): int32 LE dims at offsets 18/22
    return (
        b"BM" + (26).to_bytes(4, "little") + b"\x00" * 4 + (26).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little", signed=True)
    )


def _bmp_core(w: int, h: int) -> bytes:
    # OS/2 BITMAPCOREHEADER (DIB size 12): uint16 dims at offsets 18/20
    return (
        b"BM" + (26).to_bytes(4, "little") + b"\x00" * 4 + (26).to_bytes(4, "little")
        + (12).to_bytes(4, "little")
        + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4
    )


def _tiff(w: int, h: int, order: str = "little") -> bytes:
    bo = order
    magic = b"II*\x00" if bo == "little" else b"MM\x00*"
    # IFD at offset 8, two entries: 256 (LONG w), 257 (SHORT h)
    def entry(tag: int, typ: int, val: int, width: int) -> bytes:
        return (
            tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
            + (1).to_bytes(4, bo) + val.to_bytes(width, bo).ljust(4, b"\x00" if bo == "little" else b"\x00")
        ) if bo == "little" else (
            tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
            + (1).to_bytes(4, bo) + val.to_bytes(width, bo).rjust(4, b"\x00")[:4]
        )

    ifd = (2).to_bytes(2, bo) + entry(256, 4, w, 4) + entry(257, 3, h, 2)
    # big-endian SHORT inline values sit in the HIGH bytes of the field
    if bo == "big":
        ifd = (2).to_bytes(2, bo) + entry(256, 4, w, 4) + (
            (257).to_bytes(2, bo) + (3).to_bytes(2, bo) + (1).to_bytes(4, bo)
            + h.to_bytes(2, bo) + b"\x00\x00"
        )
    return magic + (8).to_bytes(4, bo) + ifd


def test_bmp_header_parses():
    assert multimodal.parse_image_header(_bmp(640, 480)) == (640, 480, "bmp")
    # top-down BMP stores negative height
    assert multimodal.parse_image_header(_bmp(640, -480)) == (640, 480, "bmp")
    assert multimodal.parse_image_header(b"BM" + b"\x00" * 10) is None
    # OS/2 core header: uint16 fields, not int32
    assert multimodal.parse_image_header(_bmp_core(100, 100)) == (100, 100, "bmp")


def test_tiff_header_parses_both_byte_orders():
    assert multimodal.parse_image_header(_tiff(1024, 768, "little")) == (1024, 768, "tiff")
    assert multimodal.parse_image_header(_tiff(321, 123, "big")) == (321, 123, "tiff")
    # truncated IFD -> None, not an exception
    assert multimodal.parse_image_header(_tiff(1024, 768, "little")[:12]) is None


def test_aspect_bucket_assign_hand_cases(spark):
    """Known geometries land in their named buckets: 512x512 ->
    square, 1024x576 (16:9) -> landscape_16_9, 600x800 -> portrait_3_4;
    non-images and null dims are excluded; every image lands in
    exactly one bucket."""
    from mapreduceimpl_spark.operators.multimodal import aspect_bucket_assign

    meta = spark.createDataFrame(
        [
            (1, "image", 512, 512),
            (2, "image", 1024, 576),
            (3, "image", 600, 800),
            (4, "audio", None, None),
            (5, "image", None, None),
        ],
        "asset_id long, media string, width long, height long",
    )
    rows = aspect_bucket_assign(meta).collect()
    got = {r["bucket"]: r for r in rows}
    assert got["square_1_1"]["n_images"] == 1
    assert got["square_1_1"]["avg_aspect"] == 1.0
    assert got["landscape_16_9"]["n_images"] == 1
    assert got["portrait_3_4"]["n_images"] == 1
    assert sum(r["n_images"] for r in rows) == 3  # one bucket per image


def test_aspect_bucket_assign_excludes_degenerate_dims(spark):
    """width or height 0 (corrupt headers carry them) must be excluded,
    not produce a NULL/-inf log-distance divergence."""
    from mapreduceimpl_spark.operators.multimodal import aspect_bucket_assign

    meta = spark.createDataFrame(
        [(1, "image", 512, 512), (2, "image", 0, 100), (3, "image", 100, 0)],
        "asset_id long, media string, width long, height long",
    )
    rows = aspect_bucket_assign(meta).collect()
    assert sum(r["n_images"] for r in rows) == 1


def _pcm_wav_bytes(samples, rate=8000, channels=1, prepend_list_chunk=False):
    """Hand-built 16-bit PCM WAV, independent of the catalog's
    hex-expression builder."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels,
                      2 * channels, 16)
    chunks = b""
    if prepend_list_chunk:  # exercise the chunk walk past extras
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_pcm_decode_hand_payloads(spark):
    """Real sample decode against hand-built WAVs with known stats;
    a LIST chunk before fmt must not break the walk; non-PCM and
    truncated payloads are dropped."""
    import struct

    from mapreduceimpl_spark.operators.multimodal import wav_pcm_decode

    good = _pcm_wav_bytes([100, -200, 300, -32768])
    listy = _pcm_wav_bytes([7, -7], prepend_list_chunk=True)
    nonpcm = good.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
    truncated = good[:-3]  # data header promises more bytes than remain
    rows = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(listy)),
         (3, bytearray(nonpcm)), (4, bytearray(b"not a wav")),
         (5, bytearray(truncated))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in wav_pcm_decode(rows).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1["sample_rate"], r1["channels"], r1["n_samples"]) == (8000, 1, 4)
    assert r1["peak_abs"] == 32768
    assert r1["sum_abs"] == 100 + 200 + 300 + 32768
    assert r1["sum_sq"] == 100**2 + 200**2 + 300**2 + 32768**2
    assert got[2]["n_samples"] == 2 and got[2]["sum_abs"] == 14


def test_ppm_decode_resize_hand_payload(spark):
    """Real pixel decode + NN resize against a hand-built 4x2 P6
    image with distinct per-pixel values; verifies the
    (dst*size)//out index convention and the position-weighted
    checksum; malformed headers and short planes are dropped."""
    from mapreduceimpl_spark.operators.multimodal import ppm_decode_resize

    w, h = 4, 2
    plane = bytes((10 * y + 3 * x + c) % 256
                  for y in range(h) for x in range(w) for c in range(3))
    good = f"P6\n{w} {h}\n255\n".encode() + plane
    bad_maxval = f"P6\n{w} {h}\n65535\n".encode() + plane * 2
    short = f"P6\n{w} {h}\n255\n".encode() + plane[:-1]
    rows = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad_maxval)), (3, bytearray(short))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in ppm_decode_resize(rows, out_side=2).collect()}
    assert set(got) == {1}
    r = got[1]
    assert (r["width"], r["height"], r["out_side"]) == (4, 2, 2)
    # NN indices: ys = (0*2//2, 1*2//2) = (0, 1); xs = (0*4//2, 1*4//2) = (0, 2)
    def px(y, x, c):
        return (10 * y + 3 * x + c) % 256

    expect = [px(y, x, c) for y in (0, 1) for x in (0, 2) for c in range(3)]
    assert r["top_left_r"] == expect[0] == px(0, 0, 0)
    assert r["bottom_right_b"] == expect[-1] == px(1, 2, 2)
    assert r["checksum"] == sum(v * (1 + i) for i, v in enumerate(expect))


def test_real_decoders_plan_is_shuffle_free(spark):
    """wav_pcm_decode / ppm_decode_resize are pure Arrow-batched map
    stages: no Exchange may appear in their physical plans — at 100 TB
    the decode cost is exactly one pass over the payload bytes."""
    from mapreduceimpl_spark.operators.multimodal import (
        gif_decode_stats,
        png_decode_stats,
        ppm_decode_resize,
        wav_pcm_decode,
        y4m_frame_sample,
    )
    from mapreduceimpl_spark.plans import explain_str

    assets = spark.createDataFrame(
        [(1, bytearray(b"x"))], "asset_id long, payload binary"
    )
    for df in (
        wav_pcm_decode(assets),
        ppm_decode_resize(assets),
        y4m_frame_sample(assets),
        png_decode_stats(assets),
        gif_decode_stats(assets),
    ):
        assert "Exchange" not in explain_str(df, "simple")


def test_y4m_frame_sample_hand_payload(spark):
    """Real frame walk against a hand-built YUV4MPEG2 stream: 4 C420
    4x2 frames with distinct luma planes, every=2 keeps frames 0 and
    2 with exact luma stats; FRAME params lines are tolerated; odd
    dimensions and non-Y4M payloads are dropped; a truncated final
    frame stops the walk instead of emitting garbage."""
    from mapreduceimpl_spark.operators.multimodal import y4m_frame_sample

    def frame(vals, marker=b"FRAME\n"):
        y = bytes(vals)              # 8 luma bytes (4x2)
        uv = bytes([9, 9, 8, 8])     # 2 U + 2 V
        return marker + y + uv

    hdr = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
    good = hdr + b"".join(
        frame([f * 10 + i for i in range(8)],
              marker=b"FRAME Xparam\n" if f == 1 else b"FRAME\n")
        for f in range(4)
    )
    odd = b"YUV4MPEG2 W3 H2 F25:1\n" + frame([0] * 8)
    truncated = hdr + frame([1] * 8) + b"FRAME\n\x00\x01"  # frame 1 cut short
    rows = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(odd)),
         (3, bytearray(truncated)), (4, bytearray(b"RIFFnotvideo"))],
        "asset_id long, payload binary",
    )
    got = {(r["asset_id"], r["frame_idx"]): r
           for r in y4m_frame_sample(rows, every=2).collect()}
    assert set(got) == {(1, 0), (1, 2), (3, 0)}
    f0, f2 = got[(1, 0)], got[(1, 2)]
    assert (f0["width"], f0["height"]) == (4, 2)
    assert f0["y_sum"] == sum(range(8)) and (f0["y_min"], f0["y_max"]) == (0, 7)
    assert f2["y_sum"] == sum(20 + i for i in range(8))
    assert (f2["y_min"], f2["y_max"]) == (20, 27)
    assert got[(3, 0)]["y_sum"] == 8  # the intact frame before the cut

    import pytest as _pytest

    with _pytest.raises(ValueError):
        y4m_frame_sample(rows, every=0)


def test_png_roundtrip_all_filters_and_multi_idat(spark):
    """png_encode -> png_decode_stats recovers EXACT pixels through
    zlib and all five scanline filters: a 5-row image assigns filter
    type y to row y (None/Sub/Up/Average/Paeth each exercised), split
    across 3 IDAT chunks; grayscale and RGB both verified against
    stats computed from the source array."""
    import numpy as np

    from mapreduceimpl_spark.operators.multimodal import (
        png_decode_stats,
        png_encode,
    )

    h, w = 5, 7
    rgb = np.array(
        [[[(11 * y + 3 * x + 7 * c) % 256 for c in range(3)]
          for x in range(w)] for y in range(h)],
        dtype=np.uint8,
    )
    gray = np.array(
        [[(5 * y + 13 * x) % 256 for x in range(w)] for y in range(h)],
        dtype=np.uint8,
    )
    png_rgb = png_encode(rgb, row_filters=[0, 1, 2, 3, 4], idat_split=3)
    png_gray = png_encode(gray, row_filters=[4, 3, 2, 1, 0])
    rows = spark.createDataFrame(
        [(1, bytearray(png_rgb)), (2, bytearray(png_gray))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in png_decode_stats(rows).collect()}
    assert set(got) == {1, 2}
    for aid, arr, ctype, ch in ((1, rgb, 2, 3), (2, gray, 0, 1)):
        flat = arr.astype(np.int64).reshape(-1)
        r = got[aid]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["color_type"], r["n_channels"]) == (ctype, ch)
        assert r["pix_sum"] == int(flat.sum())
        assert r["pix_min"] == int(flat.min())
        assert r["pix_max"] == int(flat.max())
        weights = np.arange(1, flat.size + 1, dtype=np.int64)
        assert r["checksum"] == int((flat * weights).sum())


def test_png_decode_drops_malformed(spark):
    """Corrupt/out-of-scope PNGs are DROPPED, never understated: a
    flipped IDAT byte (CRC mismatch), a truncated tail, a 16-bit
    depth, an interlaced header, and a valid-CRC chunk holding
    garbage deflate all vanish from the output; the pristine payload
    survives alongside them."""
    import struct
    import zlib

    import numpy as np

    from mapreduceimpl_spark.operators.multimodal import (
        png_decode_stats,
        png_encode,
    )

    good = png_encode(np.arange(12, dtype=np.uint8).reshape(2, 6))
    idat_at = good.index(b"IDAT")
    corrupt = bytearray(good)
    corrupt[idat_at + 6] ^= 0xFF  # payload byte flips; CRC now wrong
    # cut INSIDE the IDAT chunk: its length header promises bytes the
    # payload no longer holds (cutting only the IEND trailer is NOT a
    # drop — the pixel data is complete and stats aren't understated)
    truncated = good[: idat_at + 8]

    def patch_ihdr(offset: int, val: int) -> bytes:
        b = bytearray(good)
        ih = b.index(b"IHDR")
        b[ih + 4 + offset] = val
        data = bytes(b[ih + 4 : ih + 17])
        b[ih + 17 : ih + 21] = struct.pack(
            ">I", zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF
        )
        return bytes(b)

    deep = patch_ihdr(8, 16)       # bit depth 16
    interlaced = patch_ihdr(12, 1)  # Adam7

    sig = good[:8]
    ihdr_chunk = good[8 : 8 + 25]
    bad_deflate = b"notdeflate"
    garbage = (
        sig + ihdr_chunk
        + struct.pack(">I", len(bad_deflate)) + b"IDAT" + bad_deflate
        + struct.pack(">I", zlib.crc32(b"IDAT" + bad_deflate) & 0xFFFFFFFF)
        + struct.pack(">I", 0) + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )
    rows = spark.createDataFrame(
        [(1, bytearray(good)), (2, corrupt), (3, bytearray(truncated)),
         (4, bytearray(deep)), (5, bytearray(interlaced)),
         (6, bytearray(garbage)), (7, bytearray(b"not a png"))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in png_decode_stats(rows).collect()}
    assert set(got) == {1}
    assert got[1]["pix_sum"] == sum(range(12))


def test_staging_dir_isolates_processes_and_sweeps_dead_pids(tmp_path, monkeypatch):
    """The de-race contract for build-time staging entries
    (multimodal_funnel, warc_ingest — ADVICE r6): the dir is keyed by
    THIS pid (two live sessions can never share a path), a sibling
    owned by a DEAD pid is swept (SIGKILL never runs atexit), a
    sibling owned by a LIVE pid is left alone, and the env override
    redirects the root."""
    import os
    import subprocess

    from mapreduceimpl_spark.catalog import _staging_dir

    monkeypatch.setenv("MAPREDUCEIMPL_TEST_STAGE_DIR", str(tmp_path))

    # a pid that existed and is now certainly dead
    proc = subprocess.Popen(["true"])
    proc.wait()
    dead = tmp_path / f"stg_sfX_{proc.pid}"
    dead.mkdir()
    (dead / "leftover").write_text("x")
    live = tmp_path / f"stg_sfY_{os.getpid()}"
    live.mkdir()

    out = _staging_dir("stg", "/data/sf0.001", "MAPREDUCEIMPL_TEST_STAGE_DIR")
    assert out == str(tmp_path / f"stg_sf0.001_{os.getpid()}")
    assert not dead.exists(), "dead-pid sibling must be swept"
    assert live.exists(), "live-pid sibling must survive"
    # same prefix, different sf: a second call in this process still
    # yields a distinct path per sf
    out2 = _staging_dir("stg", "/data/sf0.1", "MAPREDUCEIMPL_TEST_STAGE_DIR")
    assert out2 != out and str(os.getpid()) in out2


def test_gif_roundtrip_real_lzw(spark):
    """gif_encode -> gif_decode_stats recovers EXACT index and
    palette-RGB stats through the from-scratch LZW codec, including an
    image big enough to force code-width growth; an extension block
    before the image descriptor must be skipped."""
    import numpy as np

    from mapreduceimpl_spark.operators.multimodal import (
        gif_decode_stats,
        gif_encode,
    )

    rng = np.random.default_rng(42)
    small_idx = rng.integers(0, 5, size=(6, 9), dtype=np.uint8)
    small_pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    big_idx = rng.integers(0, 200, size=(40, 50), dtype=np.uint8)
    big_pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    small = gif_encode(small_idx, small_pal)
    # splice a graphic-control extension between the GCT and the
    # image descriptor: 0x21 0xF9 [len 4][4 bytes][0 terminator]
    at = small.index(b"\x2c")
    with_ext = small[:at] + b"\x21\xf9\x04\x00\x00\x00\x00\x00" + small[at:]
    rows = spark.createDataFrame(
        [(1, bytearray(small)), (2, bytearray(gif_encode(big_idx, big_pal))),
         (3, bytearray(with_ext))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in gif_decode_stats(rows).collect()}
    assert set(got) == {1, 2, 3}
    for aid, idx, pal in ((1, small_idx, small_pal), (2, big_idx, big_pal),
                          (3, small_idx, small_pal)):
        flat = idx.astype(np.int64).reshape(-1)
        wts = np.arange(1, flat.size + 1, dtype=np.int64)
        r = got[aid]
        assert (r["width"], r["height"]) == (idx.shape[1], idx.shape[0])
        assert r["idx_sum"] == int(flat.sum())
        assert r["checksum"] == int((flat * wts).sum())
        assert r["rgb_sum"] == int(pal[idx].astype(np.int64).sum())


def test_gif_decode_drops_malformed(spark):
    """Out-of-scope/corrupt GIFs are DROPPED: interlaced flag, local
    color table flag, truncated sub-block, garbage LZW, wrong pixel
    count, no global color table."""
    import numpy as np

    from mapreduceimpl_spark.operators.multimodal import (
        gif_decode_stats,
        gif_encode,
    )

    idx = np.arange(12, dtype=np.uint8).reshape(3, 4) % 4
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    good = gif_encode(idx, pal)
    at = good.index(b"\x2c")
    interlaced = bytearray(good); interlaced[at + 9] |= 0x40
    local_ct = bytearray(good); local_ct[at + 9] |= 0x80
    no_gct = bytearray(good); no_gct[10] &= 0x7F
    truncated = good[: at + 12]
    garbage = bytearray(good)
    garbage[at + 11 :] = b"\x03\xff\xff\xff\x00\x3b"  # bogus LZW stream
    rows = spark.createDataFrame(
        [(1, bytearray(good)), (2, interlaced), (3, local_ct),
         (4, no_gct), (5, bytearray(truncated)), (6, garbage),
         (7, bytearray(b"GIF89a only header"))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in gif_decode_stats(rows).collect()}
    assert set(got) == {1}
    assert got[1]["idx_sum"] == int((np.arange(12) % 4).sum())
