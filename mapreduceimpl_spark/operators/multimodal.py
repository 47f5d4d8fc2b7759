"""Multimodal column operators: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
``BINARY`` column riding alongside typed metadata; decode / feature
extraction / resize / frame-sampling run as Arrow-batched pandas
functions over ``mapInPandas`` so each task streams batches without
materializing a partition.

Decode honesty ledger (round 7): formats that need ONLY stdlib byte
handling + numpy are decoded FOR REAL — ``wav_pcm_decode`` (16-bit
PCM sample reinterpret + exact stats), ``ppm_decode_resize``
(binary-PPM pixel plane + nearest-neighbor resize), and
``y4m_frame_sample`` (uncompressed YUV4MPEG2 frame walk + luma
stats), one per modality; plus two COMPRESSED formats:
``png_decode_stats`` (stdlib zlib inflate + all five scanline-filter
reconstructions) and ``gif_decode_stats`` (a from-scratch LZW codec,
``_lzw_compress``/``_lzw_decompress``) — all value-verified against
closed-form oracles.  Entropy-coded formats (JPEG/MP4/...) stay
STUBBED: ``decode_image_stub`` derives deterministic
fake metadata from the payload bytes and raises
``NotImplementedError`` when ``strict=True`` — the Spark-side
plumbing (schema, batching, partition flow) is real and tested; swap
``_fake_decode`` for PIL/ffmpeg in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Schema of a decoded-asset metadata record.
DECODE_SCHEMA = (
    "asset_id long, n_bytes long, content_sha string, width long, height long, "
    "format string, header_parsed boolean"
)


def to_binary_assets(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque payload
    (the fixtures ship no real media; the column type and flow are what
    matters)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )


def parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """REAL image-dimension extraction from container headers — pure
    byte parsing, no codec library needed.  Handles PNG (IHDR), GIF
    (logical screen descriptor), JPEG (SOF0/1/2 marker scan), and WEBP
    (VP8X extended header).  Returns (width, height, format) or None
    for unrecognized payloads.

    At 100 TB this is the cheap first pass a media pipeline runs on
    every asset (filter by dimensions/format BEFORE paying for pixel
    decode); only the pixel decode itself needs a codec."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        return (
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
            "png",
        )
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return (
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
            "gif",
        )
    if payload[:2] == b"\xff\xd8":
        # every SOFn frame header carries the geometry (all of
        # C0-C3, C5-C7, C9-CB, CD-CF; C4/C8/CC are DHT/JPG/DAC)
        sof = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker == 0xFF:  # legal fill byte before a marker
                i += 1
                continue
            if marker in sof:
                return (
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                    "jpeg",
                )
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length field
                continue
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        chunk = payload[12:16]
        if chunk == b"VP8X" and len(payload) >= 30:
            return (
                int.from_bytes(payload[24:27], "little") + 1,
                int.from_bytes(payload[27:30], "little") + 1,
                "webp",
            )
        if chunk == b"VP8 " and len(payload) >= 30 and payload[23:26] == b"\x9d\x01\x2a":
            # lossy VP8 keyframe: 14-bit LE dimensions after the
            # 3-byte frame tag + 3-byte start code
            return (
                int.from_bytes(payload[26:28], "little") & 0x3FFF,
                int.from_bytes(payload[28:30], "little") & 0x3FFF,
                "webp",
            )
        if chunk == b"VP8L" and len(payload) >= 25 and payload[20] == 0x2F:
            # lossless: 14-bit width-1 / height-1 packed little-endian
            bits = int.from_bytes(payload[21:25], "little")
            return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp")
        return None
    if payload[:2] == b"BM" and len(payload) >= 26:
        # DIB header size at 14 distinguishes the families: >= 40
        # (BITMAPINFOHEADER and successors) stores int32 LE dims at
        # 18/22 (negative height = top-down row order); the 12-byte
        # OS/2 BITMAPCOREHEADER stores uint16 dims at 18/20 — reading
        # it as int32 would weld width and height into garbage
        dib = int.from_bytes(payload[14:18], "little")
        if dib >= 40:
            w = int.from_bytes(payload[18:22], "little", signed=True)
            h = int.from_bytes(payload[22:26], "little", signed=True)
        elif dib == 12:
            w = int.from_bytes(payload[18:20], "little")
            h = int.from_bytes(payload[20:22], "little")
        else:
            return None
        if w <= 0 or h == 0:
            return None
        return (w, abs(h), "bmp")
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        # TIFF: walk IFD0's 12-byte entries for ImageWidth (256) /
        # ImageLength (257); SHORT(3)/LONG(4) values are inline
        order = "little" if payload[:2] == b"II" else "big"
        if len(payload) < 8:
            return None
        ifd = int.from_bytes(payload[4:8], order)
        if ifd + 2 > len(payload):
            return None
        n = int.from_bytes(payload[ifd : ifd + 2], order)
        w = h = None
        for k in range(n):
            e = ifd + 2 + 12 * k
            if e + 12 > len(payload):
                return None
            tag = int.from_bytes(payload[e : e + 2], order)
            typ = int.from_bytes(payload[e + 2 : e + 4], order)
            if tag in (256, 257) and typ in (3, 4):
                width_bytes = 2 if typ == 3 else 4
                val = int.from_bytes(payload[e + 8 : e + 8 + width_bytes], order)
                if tag == 256:
                    w = val
                else:
                    h = val
        if w is not None and h is not None:
            return (w, h, "tiff")
        return None
    return None


def parse_audio_header(payload: bytes) -> tuple[int, int, int, str] | None:
    """REAL audio metadata from container headers — pure byte parsing.
    Handles WAV (RIFF fmt chunk), FLAC (STREAMINFO), and OGG/Vorbis
    (identification header).  Returns (sample_rate_hz, channels,
    duration_ms, format) or None; duration_ms is -1 where the
    container doesn't carry it cheaply.

    Same 100 TB role as ``parse_image_header``: filter/ bucket assets
    by rate/channels/duration BEFORE paying for sample decode."""
    if (
        payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
        and len(payload) >= 44
    ):
        # chunk walk: find 'fmt ' and 'data' (usually at 12 and 36,
        # but LIST/INFO chunks may intervene)
        i, rate, channels, byte_rate, data_size = 12, None, None, None, None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            csz = int.from_bytes(payload[i + 4 : i + 8], "little")
            # guard covers every byte read below (byte_rate ends at i+20)
            if cid == b"fmt " and i + 20 <= len(payload):
                channels = int.from_bytes(payload[i + 10 : i + 12], "little")
                rate = int.from_bytes(payload[i + 12 : i + 16], "little")
                byte_rate = int.from_bytes(payload[i + 16 : i + 20], "little")
            elif cid == b"data":
                data_size = csz
            i += 8 + csz + (csz & 1)  # chunks are word-aligned
        if rate and channels:
            dur = (
                int(data_size * 1000 / byte_rate)
                if byte_rate and data_size is not None
                else -1
            )
            return rate, channels, dur, "wav"
        return None
    if payload[:4] == b"fLaC" and len(payload) >= 26:
        # first metadata block must be STREAMINFO (34 bytes, header at 4)
        if payload[4] & 0x7F != 0:
            return None
        rate = int.from_bytes(payload[18:21], "big") >> 4  # 20 bits
        channels = ((payload[20] >> 1) & 0x07) + 1
        total = (
            (payload[21] & 0x0F) << 32
        ) | int.from_bytes(payload[22:26], "big")  # 36-bit sample count
        dur = int(total * 1000 / rate) if rate and total else -1
        return (rate, channels, dur, "flac") if rate else None
    if payload[:4] == b"OggS" and len(payload) >= 58:
        # first page payload: vorbis identification header
        nsegs = payload[26]
        off = 27 + nsegs
        if payload[off : off + 7] == b"\x01vorbis" and len(payload) >= off + 16:
            channels = payload[off + 11]
            rate = int.from_bytes(payload[off + 12 : off + 16], "little")
            return (rate, channels, -1, "ogg") if rate and channels else None
        return None
    return None


def parse_video_header(payload: bytes) -> tuple[int, int, int, str] | None:
    """REAL video metadata from an ISO-BMFF (MP4/MOV) box walk — pure
    byte parsing: mvhd gives duration, tkhd gives display geometry.
    Returns (width, height, duration_ms, format) or None.  Width and
    height are -1 for audio-only moov trees."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int, depth: int = 0):
        dur_ms, w, h = None, None, None
        i = lo
        while i + 8 <= hi and depth < 6:
            size = int.from_bytes(payload[i : i + 4], "big")
            btype = payload[i + 4 : i + 8]
            if size == 1 or size == 0 or i + size > hi or size < 8:
                break
            if btype in (b"moov", b"trak"):
                d, ww, hh = walk(i + 8, i + size, depth + 1)
                dur_ms = dur_ms if dur_ms is not None else d
                w, h = (w, h) if w is not None else (ww, hh)
            elif btype == b"mvhd" and i + 32 <= hi:
                ver = payload[i + 8]
                if ver == 1:
                    scale = int.from_bytes(payload[i + 28 : i + 32], "big")
                    dur = int.from_bytes(payload[i + 32 : i + 40], "big")
                else:
                    scale = int.from_bytes(payload[i + 20 : i + 24], "big")
                    dur = int.from_bytes(payload[i + 24 : i + 28], "big")
                if scale:
                    dur_ms = int(dur * 1000 / scale)
            elif btype == b"tkhd" and i + 92 <= hi:
                ver = payload[i + 8]
                geo = i + (96 if ver == 1 else 84)
                if geo + 8 <= hi:
                    ww = int.from_bytes(payload[geo : geo + 4], "big") >> 16
                    hh = int.from_bytes(payload[geo + 4 : geo + 8], "big") >> 16
                    if ww and hh:  # audio tracks carry 0x0 geometry
                        w, h = ww, hh
            i += size
        return dur_ms, w, h

    dur_ms, w, h = walk(0, len(payload))
    if dur_ms is None and w is None:
        return None
    return (
        w if w is not None else -1,
        h if h is not None else -1,
        dur_ms if dur_ms is not None else -1,
        "mp4",
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder: width/height/format
    derived from the payload digest.  STUB — replace with a real codec.
    Only reached for payloads ``parse_image_header`` does not
    recognize (the text-byte fixtures)."""
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    fmt = ("png", "jpeg", "webp")[digest[2] % 3]
    return width, height, fmt


def decode_image_stub(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract pass over binary assets via mapInPandas.

    ``strict=True`` raises NotImplementedError (no codec libs here) —
    the honest production marker.  Default runs the deterministic fake
    so the pipeline shape is executable and testable.
    """
    if strict:
        raise NotImplementedError(
            "real image decode requires codec libraries not present in this "
            "environment; the Spark plumbing below is the production shape"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # real header parse first; digest-derived fake only for
            # unrecognized payloads (the fixtures' text bytes).  The
            # header_parsed flag lets downstream filters distinguish
            # true geometry from the deterministic stand-in.
            # null payloads parse as empty bytes (-> fake metadata,
            # header_parsed False) instead of crashing the task
            parsed = [
                parse_image_header(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            meta = [
                m if m is not None else _fake_decode(bytes(p) if p is not None else b"")
                for m, p in zip(parsed, pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "n_bytes": [
                        len(bytes(p) if p is not None else b"") for p in pdf["payload"]
                    ],
                    "content_sha": [
                        hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                    "header_parsed": [m is not None for m in parsed],
                }
            )

    return assets.mapInPandas(decode, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, width long, height long, target_w long, target_h long, scale double"
)


def resize_stub(decoded: DataFrame, max_side: int = 64, strict: bool = False) -> DataFrame:
    """Resize pass over decoded assets: computes the aspect-preserving
    target geometry (real) and would rescale pixels (stubbed — no codec
    libs).  Shape: metadata-only transform, fused into the decode scan.
    """
    if strict:
        raise NotImplementedError("pixel rescaling requires codec libraries")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (max_side / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "target_w": (pdf["width"] * scale).round().astype("int64"),
                    "target_h": (pdf["height"] * scale).round().astype("int64"),
                    "scale": scale,
                }
            )

    return decoded.mapInPandas(resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "asset_id long, frame_idx long, frame_ts_ms long, frame_sha string"


def frame_sample_stub(
    assets: DataFrame, fps_out: float = 1.0, duration_s: float = 8.0, strict: bool = False
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (row-expanding mapInPandas — the batch shape real frame
    extraction uses).  Frame bytes are stubbed as digests of
    (payload, frame index); timing math is real.
    """
    if strict:
        raise NotImplementedError("video decode requires codec libraries")

    n_frames = int(duration_s * fps_out)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, shas = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(n_frames):
                    ids.append(aid)
                    idxs.append(i)
                    tss.append(int(i * 1000 / fps_out))
                    shas.append(hashlib.sha256(raw + i.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame_sha": shas}
            )

    return assets.mapInPandas(sample, schema=FRAME_SCHEMA)


MEDIA_SCHEMA = (
    "asset_id long, n_bytes long, media string, format string, width long, "
    "height long, sample_rate long, channels long, duration_ms long, "
    "header_parsed boolean"
)


def probe_media(assets: DataFrame) -> DataFrame:
    """Media triage: ONE Arrow-batched pass over opaque payloads tries
    the image, audio, then video header parsers and emits a typed
    metadata row per asset (``media`` in image/audio/video/unknown;
    fields that don't apply are NULL).

    This is the first operator a mixed 100 TB media crawl runs: route
    by ``media``/``format``, filter by geometry/rate/duration, and
    only then pay for codec decode on the surviving subset.  All
    parsing is real byte parsing (no codec libs); only pixel/sample
    decode is stubbed."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "asset_id", "n_bytes", "media", "format", "width",
                    "height", "sample_rate", "channels", "duration_ms",
                    "header_parsed",
                )
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                media, fmt, w, h, rate, ch, dur, ok = (
                    "unknown", None, None, None, None, None, None, False,
                )
                img = parse_image_header(raw)
                if img is not None:
                    media, fmt, (w, h), ok = "image", img[2], img[:2], True
                else:
                    aud = parse_audio_header(raw)
                    if aud is not None:
                        media, fmt, ok = "audio", aud[3], True
                        rate, ch = aud[0], aud[1]
                        dur = aud[2] if aud[2] >= 0 else None
                    else:
                        vid = parse_video_header(raw)
                        if vid is not None:
                            media, fmt, ok = "video", vid[3], True
                            w = vid[0] if vid[0] >= 0 else None
                            h = vid[1] if vid[1] >= 0 else None
                            dur = vid[2] if vid[2] >= 0 else None
                out["asset_id"].append(aid)
                out["n_bytes"].append(len(raw))
                out["media"].append(media)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["duration_ms"].append(dur)
                out["header_parsed"].append(ok)
            yield pd.DataFrame(out)

    return assets.mapInPandas(probe, schema=MEDIA_SCHEMA)


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """End-to-end: docs -> binary assets -> decoded metadata summary.

    n_bytes/content_sha are real (and DuckDB-checkable); width/height/
    format come from the stub decoder (deterministic but fake).
    """
    return decode_image_stub(to_binary_assets(docs))


# standard SDXL-style aspect buckets: (name, width:height ratio)
ASPECT_BUCKETS: tuple[tuple[str, float], ...] = (
    ("square_1_1", 1.0),
    ("portrait_3_4", 0.75),
    ("portrait_9_16", 0.5625),
    ("portrait_2_3", 2.0 / 3.0),
    ("landscape_4_3", 4.0 / 3.0),
    ("landscape_3_2", 1.5),
    ("landscape_16_9", 16.0 / 9.0),
)


def aspect_bucket_assign(
    meta: DataFrame,
    buckets: tuple[tuple[str, float], ...] = ASPECT_BUCKETS,
) -> DataFrame:
    """Assign every parsed image to its nearest aspect-ratio bucket —
    the batching prerequisite of any resolution-bucketed image
    training run (a batch mixes only same-bucket images so the crop
    is minimal): nearest by |ln(w/h) - ln(bucket_ratio)|, the
    symmetric log-distance (4:3 and 3:4 are equally far from square).

    Determinism: the distance is quantized (round 9) BEFORE ranking
    and ties break on bucket name, so an engine-ULP difference in ln
    can never flip an assignment; aspects themselves are exact w/h
    divisions of header-parsed integers.  Output per bucket: image
    count and decimal-routed mean aspect.

    Scale: images broadcast-join the O(|buckets|) list (7 rows), one
    per-asset window rank on (asset), one O(buckets) aggregate.  The
    fact table shuffles once (the rank's partitionBy asset reuses no
    prior Exchange but keys are unique and uniform).
    """
    b_rows = [(n, r) for n, r in buckets]
    bdf = meta.sparkSession.createDataFrame(b_rows, "bucket string, ratio double")
    images = meta.filter(
        (F.col("media") == "image")
        & F.col("width").isNotNull()
        & F.col("height").isNotNull()
        # a corrupt header CAN carry width/height 0 — ln(0) is NULL in
        # Spark but -inf in DuckDB, so degenerate geometry is excluded
        # on both engines rather than diverging
        & (F.col("height") > 0)
        & (F.col("width") > 0)
    ).select("asset_id", (F.col("width") / F.col("height")).alias("aspect"))
    scored = images.crossJoin(F.broadcast(bdf)).select(
        "asset_id",
        "aspect",
        "bucket",
        "ratio",
        F.round(
            F.abs(F.log(F.col("aspect")) - F.log(F.col("ratio"))), 9
        ).alias("dist9"),
    )
    w = Window.partitionBy("asset_id").orderBy("dist9", "bucket")
    assigned = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return assigned.groupBy("bucket", "ratio").agg(
        F.count("*").cast("long").alias("n_images"),
        (
            F.sum(F.col("aspect").cast("decimal(28,12)")).cast("double")
            / F.count("*")
        ).alias("avg_aspect"),
    )


# ---------------------------------------------------------------------------
# REAL sample/pixel decode for codec-free formats (round 7)
# ---------------------------------------------------------------------------
# The compressed formats (PNG/JPEG/MP4/...) stay honestly stubbed —
# no codec libraries here — but PCM WAV and binary PPM need only
# stdlib byte handling + numpy, so their decode is REAL: actual
# sample/pixel bytes parsed back out of the container, Arrow-batched.

WAV_PCM_SCHEMA = (
    "asset_id long, sample_rate long, channels long, n_samples long, "
    "peak_abs long, sum_abs long, sum_sq long"
)


def wav_pcm_stats(b: bytes) -> dict | None:
    """Pure per-payload 16-bit PCM WAV decode (the unit
    ``wav_pcm_decode`` maps over the corpus); None for non-WAV,
    non-PCM, non-16-bit, odd-byte, or truncated payloads.
    Module-level so property tests fuzz it directly."""
    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, rate, channels, fmt_code, bits = 12, None, None, None, None
    data, truncated = None, False
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        csz = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            # a fmt chunk shorter than the 16 canonical PCM bytes
            # would make the fixed-offset reads below consume the
            # NEXT chunk's bytes as fmt fields — plausible-but-wrong
            # stats instead of a drop (same contract as the data
            # truncation check)
            if csz < 16 or i + 24 > len(b):
                truncated = True
                break
            fmt_code = int.from_bytes(b[i + 8 : i + 10], "little")
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            if i + 8 + csz > len(b):
                # chunk header promises more bytes than the payload
                # holds: understating the stats silently would be
                # worse than dropping
                truncated = True
                break
            data = b[i + 8 : i + 8 + csz]
        i += 8 + csz + (csz & 1)
    if truncated or fmt_code != 1 or bits != 16:
        return None
    if not rate or not channels or data is None:
        return None
    if len(data) % 2:  # odd byte count cannot be 16-bit PCM
        return None
    arr = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "n_samples": int(arr.size),
        "peak_abs": int(np.abs(arr).max()) if arr.size else 0,
        "sum_abs": int(np.abs(arr).sum()),
        "sum_sq": int((arr * arr).sum()),
    }


def wav_pcm_decode(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL audio sample decode for 16-bit PCM WAV payloads: walk the
    RIFF chunks, locate fmt (audio_format must be 1 = PCM, 16-bit) and
    data, reinterpret the data bytes as little-endian int16 samples
    with numpy, and emit exact-integer sample statistics —
    (asset_id, sample_rate, channels, n_samples, peak_abs, sum_abs,
    sum_sq).  n_samples counts interleaved samples across channels;
    all stats are exact BIGINTs so the engine-parity contract has no
    float surface at all.  Non-WAV / non-PCM / non-16-bit payloads are
    dropped (filter upstream with ``probe_media`` if counts matter).

    This is the step the image/video tiers still stub: WAV PCM needs
    no codec library, so the decode here is the real thing — the
    catalog entry plants payloads whose samples are an analytic
    function of doc_id and the DuckDB oracle computes the same stats
    in closed form, which fails if ANY byte of the builder or the
    parser drifts.

    Scale: one Arrow-batched ``mapInPandas`` map stage, no shuffle;
    the numpy reinterpret is O(bytes) with no Python per-sample loop.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "sample_rate": [], "channels": [],
                "n_samples": [], "peak_abs": [], "sum_abs": [], "sum_sq": [],
            }
            for aid, blob in zip(pdf[id_col], pdf[payload_col]):
                st = wav_pcm_stats(b"" if blob is None else bytes(blob))
                if st is None:
                    continue
                out["asset_id"].append(int(aid))
                for k, v in st.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return assets.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(decode, WAV_PCM_SCHEMA)


PPM_RESIZE_SCHEMA = (
    "asset_id long, width long, height long, out_side long, "
    "checksum long, top_left_r long, bottom_right_b long"
)


def ppm_resize_stats(b: bytes, out_side: int) -> dict | None:
    """Pure per-payload binary-PPM decode + nearest-neighbor resize
    (the unit ``ppm_decode_resize`` maps over the corpus); None for
    non-P6, non-255-maxval, malformed-header, or short-plane payloads.
    Module-level so property tests fuzz it directly."""
    import numpy as np

    if b[:2] != b"P6":
        return None
    # header: P6 <ws> width <ws> height <ws> maxval <single ws>
    toks, i, tok = [], 2, b""
    while i < len(b) and len(toks) < 3:
        c = b[i : i + 1]
        if c in (b" ", b"\t", b"\n", b"\r"):
            if tok:
                toks.append(tok)
                tok = b""
        else:
            tok += c
        i += 1
    if len(toks) < 3 or not all(t.isdigit() for t in toks):
        return None
    w, h, maxval = (int(t) for t in toks)
    if maxval != 255 or w < 1 or h < 1:
        return None
    plane = b[i : i + w * h * 3]
    if len(plane) < w * h * 3:
        return None
    arr = np.frombuffer(plane, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(out_side) * h) // out_side
    xs = (np.arange(out_side) * w) // out_side
    resized = arr[np.ix_(ys, xs)].astype(np.int64)  # (out, out, 3)
    flat = resized.reshape(-1)
    weights = np.arange(1, flat.size + 1, dtype=np.int64)
    return {
        "width": w,
        "height": h,
        "out_side": out_side,
        "checksum": int((flat * weights).sum()),
        "top_left_r": int(resized[0, 0, 0]),
        "bottom_right_b": int(resized[-1, -1, 2]),
    }


def ppm_decode_resize(
    assets: DataFrame,
    out_side: int = 2,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL pixel decode + nearest-neighbor resize for binary PPM
    (P6) payloads — the uncompressed image format stdlib bytes can
    decode, making the resize tier real instead of stubbed: parse the
    ASCII header (magic, width, height, maxval), reinterpret the RGB
    plane with numpy, resize to ``out_side`` x ``out_side`` with the
    floor(i * src / dst) nearest-neighbor index convention, and emit
    exact-integer results: a position-weighted checksum of the resized
    pixels (sum over row-major (y, x, c) of value * (1 + index)) plus
    two corner samples.  maxval must be 255 (1 byte/channel);
    malformed or non-P6 payloads are dropped.

    Scale: Arrow-batched ``mapInPandas`` map stage, no shuffle; numpy
    fancy indexing does the resize without per-pixel Python.
    """
    if out_side < 1:
        raise ValueError(f"ppm_decode_resize: out_side must be >= 1, got {out_side}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "width": [], "height": [], "out_side": [],
                "checksum": [], "top_left_r": [], "bottom_right_b": [],
            }
            for aid, blob in zip(pdf[id_col], pdf[payload_col]):
                st = ppm_resize_stats(
                    b"" if blob is None else bytes(blob), out_side
                )
                if st is None:
                    continue
                out["asset_id"].append(int(aid))
                for k, v in st.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return assets.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(decode, PPM_RESIZE_SCHEMA)


Y4M_FRAME_SCHEMA = (
    "asset_id long, frame_idx long, width long, height long, "
    "y_sum long, y_min long, y_max long"
)


def y4m_frame_stats(b: bytes, every: int) -> list[dict]:
    """Pure per-payload YUV4MPEG2 frame walk (the unit
    ``y4m_frame_sample`` maps over the corpus): one dict per SAMPLED
    frame; empty list for non-Y4M / odd-dimension payloads, and the
    walk STOPS at a truncated frame instead of emitting garbage.
    Module-level so property tests fuzz it directly."""
    import numpy as np

    out: list[dict] = []
    if not b.startswith(b"YUV4MPEG2"):
        return out
    nl = b.find(b"\n")
    if nl < 0:
        return out
    w = h = None
    for tag in b[9:nl].split(b" "):
        if tag[:1] == b"W" and tag[1:].isdigit():
            w = int(tag[1:])
        elif tag[:1] == b"H" and tag[1:].isdigit():
            h = int(tag[1:])
    if not w or not h or w % 2 or h % 2:
        return out
    fsize = w * h * 3 // 2
    i, fidx = nl + 1, 0
    while b[i : i + 5] == b"FRAME":
        fnl = b.find(b"\n", i)
        if fnl < 0 or fnl + 1 + fsize > len(b):
            break
        if fidx % every == 0:
            y = np.frombuffer(
                b[fnl + 1 : fnl + 1 + w * h], dtype=np.uint8
            ).astype(np.int64)
            out.append(
                {
                    "frame_idx": fidx,
                    "width": w,
                    "height": h,
                    "y_sum": int(y.sum()),
                    "y_min": int(y.min()),
                    "y_max": int(y.max()),
                }
            )
        i = fnl + 1 + fsize
        fidx += 1
    return out


def y4m_frame_sample(
    assets: DataFrame,
    every: int = 2,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL video frame sampling for uncompressed Y4M (YUV4MPEG2)
    payloads — the third modality made real where no codec library is
    needed (PCM WAV covered audio, binary PPM covered images): parse
    the ASCII stream header (W/H tags; C420 8-bit chroma assumed, so
    a frame is w*h*3/2 bytes), walk the ``FRAME`` markers, keep every
    ``every``-th frame starting at 0 (the standard sampling cadence a
    vision encoder's loader uses), and emit exact-integer luma-plane
    stats per sampled frame: (asset_id, frame_idx, width, height,
    y_sum, y_min, y_max).  Only the Y plane is summarized — that is
    the plane frame samplers hand downstream.  Non-Y4M payloads, odd
    dimensions, and truncated frames are dropped.

    Scale: one Arrow-batched ``mapInPandas`` map stage, no shuffle;
    numpy reinterprets each sampled Y plane with no per-pixel Python,
    and skipped frames cost a pointer bump, not a decode.
    """
    if every < 1:
        raise ValueError(f"y4m_frame_sample: every must be >= 1, got {every}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "frame_idx": [], "width": [], "height": [],
                "y_sum": [], "y_min": [], "y_max": [],
            }
            for aid, blob in zip(pdf[id_col], pdf[payload_col]):
                for fr in y4m_frame_stats(
                    b"" if blob is None else bytes(blob), every
                ):
                    out["asset_id"].append(int(aid))
                    for k, v in fr.items():
                        out[k].append(v)
            yield pd.DataFrame(out)

    return assets.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(decode, Y4M_FRAME_SCHEMA)


PNG_DECODE_SCHEMA = (
    "asset_id long, width long, height long, color_type long, "
    "n_channels long, pix_sum long, pix_min long, pix_max long, "
    "checksum long"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(
    pixels,  # numpy uint8 array (h, w) gray or (h, w, 3) RGB
    row_filters=None,  # per-row filter types 0..4; default all 0
    idat_split: int = 1,  # number of IDAT chunks to split the stream into
) -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib + numpy, no codec libs):
    8-bit grayscale (color_type 0) or RGB (color_type 2),
    non-interlaced, with an explicit per-row scanline filter choice so
    fixtures can exercise EVERY filter reconstruction path of
    ``png_decode_stats`` (forward filtering is closed-form — Sub /
    Up / Average / Paeth predictors subtracted mod 256 — so the
    encoder is fully vectorizable; only the DECODER has the sequential
    recon dependence).  ``idat_split`` > 1 splits the deflate stream
    across multiple IDAT chunks, which the spec allows and decoders
    must concatenate.  Output is a spec-valid PNG (correct CRCs) that
    any external viewer opens; within this repo it is the fixture
    builder for the planted-payload decode oracle.  Byte determinism
    holds per zlib build (deflate output may differ across zlib
    versions while the decoded pixels — and therefore every
    oracle-checked stat — stay identical).
    """
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, ch = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, ch = 2, 3
    else:
        raise ValueError(f"png_encode: want (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    if h < 1 or w < 1:
        raise ValueError(f"png_encode: empty image {arr.shape}")
    filters = [0] * h if row_filters is None else [int(f) for f in row_filters]
    if len(filters) != h or any(f < 0 or f > 4 for f in filters):
        raise ValueError(f"png_encode: need {h} per-row filters in 0..4")
    if idat_split < 1:
        raise ValueError(f"png_encode: idat_split must be >= 1, got {idat_split}")

    a = arr.astype(np.int64)
    raw = a.reshape(h, w * ch)
    left = np.concatenate(
        [np.zeros((h, ch), dtype=np.int64), raw[:, :-ch]], axis=1
    )
    up = np.concatenate([np.zeros((1, w * ch), dtype=np.int64), raw[:-1]], axis=0)
    upleft = np.concatenate(
        [np.zeros((h, ch), dtype=np.int64), up[:, :-ch]], axis=1
    )
    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    paeth = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
    )
    predictor = {0: np.zeros_like(raw), 1: left, 2: up,
                 3: (left + up) // 2, 4: paeth}
    lines = bytearray()
    for y in range(h):
        f = filters[y]
        lines.append(f)
        lines.extend(((raw[y] - predictor[f][y]) % 256).astype(np.uint8).tobytes())
    stream = zlib.compress(bytes(lines), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = bytearray(_PNG_SIG)
    out += chunk(b"IHDR", ihdr)
    step = max(1, (len(stream) + idat_split - 1) // idat_split)
    for i in range(0, len(stream), step):
        out += chunk(b"IDAT", stream[i : i + step])
    out += chunk(b"IEND", b"")
    return bytes(out)


def _png_recon(flt, prev, ftype: int, ch: int):
    """Reconstruct one defiltered scanline (int64 arrays of w*ch)."""
    import numpy as np

    if ftype == 0:
        return flt
    if ftype == 2:
        return (flt + prev) % 256
    if ftype == 1:
        chains = flt.reshape(-1, ch)  # (w, ch): recon = cumsum mod 256
        return (np.cumsum(chains, axis=0) % 256).reshape(-1)
    rec = np.empty_like(flt)
    w = flt.size // ch
    row = flt.reshape(w, ch)
    pr = prev.reshape(w, ch)
    left = np.zeros(ch, dtype=np.int64)
    upleft = np.zeros(ch, dtype=np.int64)
    outr = rec.reshape(w, ch)
    for x in range(w):
        if ftype == 3:
            pred = (left + pr[x]) // 2
        else:  # Paeth
            p = left + pr[x] - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - pr[x]), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, pr[x], upleft)
            )
        outr[x] = (row[x] + pred) % 256
        left = outr[x]
        upleft = pr[x]
    return rec


def png_stats(b: bytes) -> dict | None:
    """Pure per-payload PNG decode (the unit ``png_decode_stats`` maps
    over the corpus): returns the exact-integer stat dict, or None for
    anything malformed or out of the codec-free scope (bad signature,
    CRC mismatch, truncated chunk, non-8-bit, palette/alpha, Adam7,
    garbage deflate, short inflate, unknown filter).  Module-level so
    property tests can fuzz it directly — arbitrary bytes must return
    None or a valid dict, never raise."""
    import struct
    import zlib

    import numpy as np

    if b[: len(_PNG_SIG)] != _PNG_SIG:
        return None
    i, ihdr, idat = len(_PNG_SIG), None, bytearray()
    while i + 12 <= len(b):
        (clen,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        if i + 12 + clen > len(b):  # truncated chunk: drop
            return None
        data = b[i + 8 : i + 8 + clen]
        (crc,) = struct.unpack(">I", b[i + 8 + clen : i + 12 + clen])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if ihdr is None or len(ihdr) != 13 or not idat:
        return None
    w, h, depth, color_type, comp, fmeth, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if (
        depth != 8 or color_type not in (0, 2)
        or comp != 0 or fmeth != 0 or interlace != 0
        or w < 1 or h < 1
    ):
        return None
    ch = 3 if color_type == 2 else 1
    try:
        lines = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = 1 + w * ch
    if len(lines) != h * stride:
        return None
    la = np.frombuffer(lines, dtype=np.uint8).reshape(h, stride)
    ftypes = la[:, 0]
    if (ftypes > 4).any():
        return None
    prev = np.zeros(w * ch, dtype=np.int64)
    rows = []
    for y in range(h):
        prev = _png_recon(la[y, 1:].astype(np.int64), prev, int(ftypes[y]), ch)
        rows.append(prev)
    pix = np.concatenate(rows)
    weights = np.arange(1, pix.size + 1, dtype=np.int64)
    return {
        "width": int(w),
        "height": int(h),
        "color_type": int(color_type),
        "n_channels": ch,
        "pix_sum": int(pix.sum()),
        "pix_min": int(pix.min()),
        "pix_max": int(pix.max()),
        "checksum": int((pix * weights).sum()),
    }


def png_decode_stats(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL compressed-image decode for PNG payloads — the first
    COMPRESSED format made real (WAV/PPM/Y4M covered the uncompressed
    tiers): walk the chunk stream verifying each CRC32, parse IHDR,
    concatenate ALL IDAT chunks (the spec allows any split), inflate
    with stdlib zlib, and reconstruct the five scanline filters (None/
    Sub/Up/Average/Paeth) to recover exact pixels; emit exact-integer
    stats — (asset_id, width, height, color_type, n_channels, pix_sum,
    pix_min, pix_max, checksum) where checksum is the same
    position-weighted SUM(v * (1 + row_major_idx)) contract as the PPM
    tier, so the planted-payload oracle has zero float surface.

    Scope is the honest codec-free boundary: 8-bit depth, grayscale
    (color_type 0) or RGB (2), non-interlaced.  Palette/alpha/16-bit/
    Adam7, bad CRCs, truncated chunks, short inflate output, and
    unknown filter bytes are all DROPPED, never understated (the
    truncated-container rule).

    Scale: one Arrow-batched ``mapInPandas`` map stage, no shuffle.
    Filters None/Sub/Up reconstruct vectorized (Sub is a per-channel
    cumsum mod 256); Average/Paeth are sequential along a scanline by
    definition (each pixel needs the RECONSTRUCTED left neighbor), so
    those rows pay a per-pixel Python loop vectorized across channels
    — the honest cost of PNG without a codec library, bounded per row.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "width": [], "height": [], "color_type": [],
                "n_channels": [], "pix_sum": [], "pix_min": [], "pix_max": [],
                "checksum": [],
            }
            for aid, blob in zip(pdf[id_col], pdf[payload_col]):
                st = png_stats(b"" if blob is None else bytes(blob))
                if st is None:
                    continue
                out["asset_id"].append(int(aid))
                for k, v in st.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return assets.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(decode, PNG_DECODE_SCHEMA)


GIF_DECODE_SCHEMA = (
    "asset_id long, width long, height long, palette_size long, "
    "idx_sum long, idx_min long, idx_max long, checksum long, rgb_sum long"
)


def _lzw_compress(data: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW compression (dictionary coding, LSB-first bit
    packing): emits CLEAR, builds multi-byte string codes, widens the
    code width by the canonical rule (width += 1 when next_code ==
    2^width + 1 — the timing every spec decoder mirrors), and resets
    with CLEAR at the 4096-code table cap."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = bytearray()
    acc = n_acc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    # Width timing must SIMULATE THE DECODER, not the encoder's own
    # dictionary: the decoder appends an entry (and may widen) after
    # EVERY data code except the first since CLEAR — including the
    # final one before END — while the encoder's last emit assigns
    # nothing.  Tracking only next_code desyncs exactly there (the
    # END code lands at the old width; hypothesis found the case).
    table = {bytes([i]): i for i in range(clear)}
    next_code, width = end + 1, min_code_size + 1
    dec_size = end + 1  # decoder's simulated table size
    first = True        # decoder skips the append on the first data code
    emit(clear, width)

    def after_data_code() -> None:
        nonlocal dec_size, width, first
        if not first and dec_size < 4096:
            dec_size += 1
            if dec_size == (1 << width) and width < 12:
                width += 1
        first = False

    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        after_data_code()
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        else:  # table full: reset (decoder mirrors on CLEAR)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = end + 1, min_code_size + 1
            dec_size, first = end + 1, True
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
        after_data_code()
    emit(end, width)
    if n_acc:
        bits.append(acc & 0xFF)
    return bytes(bits)


def _lzw_decompress(bits: bytes, min_code_size: int, max_out: int) -> bytes | None:
    """Canonical GIF LZW decode; None on any malformation (code past
    the table, missing data, output overrun)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev = None
    acc = n_acc = pos = 0
    while True:
        while n_acc < width:
            if pos >= len(bits):
                return None  # ran out before END
            acc |= bits[pos] << n_acc
            pos += 1
            n_acc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and code not in (clear, end):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        out += entry
        if len(out) > max_out:
            return None
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out) if len(out) == max_out else None


def gif_encode(indices, palette) -> bytes:
    """Minimal REAL GIF89a encoder (stdlib-only): single non-interlaced
    frame, global color table, REAL LZW compression of the index
    plane (multi-byte dictionary strings, width growth, 4096-cap
    CLEAR resets — not the 'uncompressed GIF' trick).  ``indices`` is
    a (h, w) uint8 array of palette indices; ``palette`` is (p, 3)
    uint8 RGB.  Spec-valid output any external viewer opens; within
    this repo it is the fixture builder for the planted-payload
    decode oracle (bytes are fully deterministic — LZW has no
    library/version surface, unlike deflate)."""
    import struct

    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError(
            f"gif_encode: want (h,w) indices + (p,3) palette, "
            f"got {idx.shape}, {pal.shape}"
        )
    h, w = idx.shape
    p = pal.shape[0]
    if h < 1 or w < 1 or p < 2 or p > 256 or int(idx.max()) >= p:
        raise ValueError("gif_encode: empty image, bad palette size, or "
                         "index out of palette range")
    gct_bits = max(1, (p - 1).bit_length())  # table size 2^gct_bits >= p
    gct_n = 1 << gct_bits
    full_pal = np.zeros((gct_n, 3), dtype=np.uint8)
    full_pal[:p] = pal
    min_code_size = max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (gct_bits - 1), 0, 0])  # GCT flag+size, bg, aspect
    out += full_pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code_size)
    stream = _lzw_compress(idx.reshape(-1).tobytes(), min_code_size)
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def gif_stats(b: bytes) -> dict | None:
    """Pure per-payload GIF decode (the unit ``gif_decode_stats`` maps
    over the corpus): header + logical screen descriptor + global
    color table, extension-block skipping, first image descriptor,
    REAL LZW decompression of the index plane, and exact-integer
    stats over both the indices and their palette RGB values.  None
    for anything malformed or out of scope (no global color table,
    local color tables, interlacing, index past the declared palette,
    LZW errors, pixel-count mismatch) — module-level so property
    tests fuzz it directly; arbitrary bytes never raise."""
    import struct

    import numpy as np

    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    if not (flags & 0x80) or w < 1 or h < 1:
        return None  # scope: global color table required
    gct_n = 2 << (flags & 0x07)
    i = 13
    if i + 3 * gct_n > len(b):
        return None
    pal = np.frombuffer(b[i : i + 3 * gct_n], dtype=np.uint8).reshape(gct_n, 3)
    i += 3 * gct_n
    while i < len(b):
        marker = b[i]
        i += 1
        if marker == 0x21:  # extension: label + sub-blocks
            i += 1
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif marker == 0x2C:
            if i + 9 > len(b):
                return None
            _, _, iw, ih = struct.unpack("<HHHH", b[i : i + 8])
            iflags = b[i + 8]
            i += 9
            if iflags & 0x80 or iflags & 0x40:
                return None  # scope: no local tables, no interlace
            if iw != w or ih != h or i >= len(b):
                return None
            min_code_size = b[i]
            i += 1
            if min_code_size < 2 or min_code_size > 8:
                return None
            stream = bytearray()
            while i < len(b) and b[i] != 0:
                n = b[i]
                if i + 1 + n > len(b):
                    return None  # truncated sub-block: drop
                stream += b[i + 1 : i + 1 + n]
                i += 1 + n
            if i >= len(b):
                return None
            raw = _lzw_decompress(bytes(stream), min_code_size, w * h)
            if raw is None:
                return None
            idx = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            if int(idx.max()) >= gct_n:
                return None
            weights = np.arange(1, idx.size + 1, dtype=np.int64)
            rgb = pal[idx].astype(np.int64)
            return {
                "width": int(w),
                "height": int(h),
                "palette_size": int(gct_n),
                "idx_sum": int(idx.sum()),
                "idx_min": int(idx.min()),
                "idx_max": int(idx.max()),
                "checksum": int((idx * weights).sum()),
                "rgb_sum": int(rgb.sum()),
            }
        elif marker == 0x3B:
            return None  # trailer before any image
        else:
            return None
    return None


def gif_decode_stats(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL GIF decode — the second compressed format made real, this
    time with the codec implemented IN THE REPO (``_lzw_decompress``;
    PNG leaned on stdlib zlib): block walk, global color table, LZW
    index-plane decompression, and exact-integer stats over indices
    and palette RGB.  Scope is single-frame, non-interlaced, global
    palette; everything else — and every malformation — is DROPPED,
    never understated.

    Scale: one Arrow-batched ``mapInPandas`` map stage, no shuffle.
    LZW decode is inherently sequential per payload (each code can
    extend the dictionary the next code uses), so the per-byte cost
    is a Python loop — the honest price of a from-scratch codec;
    parallelism comes from payloads-per-partition, which is the axis
    that grows at 100 TB.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "width": [], "height": [], "palette_size": [],
                "idx_sum": [], "idx_min": [], "idx_max": [], "checksum": [],
                "rgb_sum": [],
            }
            for aid, blob in zip(pdf[id_col], pdf[payload_col]):
                st = gif_stats(b"" if blob is None else bytes(blob))
                if st is None:
                    continue
                out["asset_id"].append(int(aid))
                for k, v in st.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return assets.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(decode, GIF_DECODE_SCHEMA)
