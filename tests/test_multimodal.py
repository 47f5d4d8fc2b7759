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


def test_binary_column_type(docs):
    assets = multimodal.to_binary_assets(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    n = assets.filter(F.length("payload") > 0).count()
    assert n == docs.count()
