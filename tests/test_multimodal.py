"""Multimodal plumbing tests: binary columns through mapInPandas —
schema contract, determinism, and the 1→N frame-sample shape."""

from __future__ import annotations

import hashlib

from cve_manager_spark.operators.multimodal import (
    attach_binary,
    decode_resize,
    decode_stub,
    extract_features,
    frame_sample,
)
from cve_manager_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


def test_extract_features_matches_local_hash(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    feats = extract_features(attach_binary(docs)).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == 20
    for r in feats:
        raw = texts[r["doc_id"]].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["content_sha"] == hashlib.sha256(raw).hexdigest()
        assert r["head_hex"] == raw[:8].hex()


def test_decode_resize_stub_shape(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    thumbs = decode_resize(attach_binary(docs), target=(16, 16)).collect()
    assert len(thumbs) == 5
    for r in thumbs:
        assert (r["width"], r["height"]) == (16, 16)
        assert len(r["thumb"]) == 16 * 16


def test_decode_resize_pluggable_decoder(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(3)

    def fake_decoder(data: bytes, target):
        return bytes([len(data) % 256]) * (target[0] * target[1])

    rows = decode_resize(attach_binary(docs), target=(4, 4), real_decoder=fake_decoder).collect()
    for r in rows:
        assert len(set(r["thumb"])) == 1  # constant fill from the fake


def test_frame_sample_one_to_many(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(4)
    src = attach_binary(docs)
    frames = frame_sample(src, every_n=50).collect()
    blobs = {r["doc_id"]: bytes(r["data"]) for r in src.collect()}
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        blob = blobs[doc_id]
        assert len(rs) == (len(blob) + 49) // 50
        rs.sort(key=lambda r: r["frame_idx"])
        assert b"".join(bytes(r["frame"]) for r in rs) == blob


def test_decode_stub_deterministic():
    assert decode_stub(b"abc") == decode_stub(b"abc")
    assert decode_stub(b"abc") != decode_stub(b"abd")
    assert len(decode_stub(b"abc", (8, 8))) == 64
