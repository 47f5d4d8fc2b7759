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
