"""Multimodal binary-column plumbing: schema, Arrow batch flow through
mapInPandas, deterministic stub features, payload pruning."""

from __future__ import annotations

import pytest

from parking_bigdata_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", "image/png", bytes([137, 80, 78, 71] * 16), 32, 32, None),
        (2, "image", "image/jpeg", bytes(range(256)), 64, 64, None),
        (3, "audio", "audio/wav", bytes([0, 1] * 100), None, None, 2.5),
        (4, "video", "video/mp4", None, 640, 480, 12.0),
    ]
    return spark.createDataFrame(rows, mm.ASSET_SCHEMA)


def test_extract_features_shapes(assets):
    out = mm.extract_features(assets).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert len(out) == 4
    assert by_id[1]["n_bytes"] == 64
    assert len(by_id[1]["feature"]) == 8
    assert by_id[4]["feature"] == []          # NULL payload → empty feature
    assert by_id[1]["feature"][0] == 64.0     # len(payload) is feature[0]
    assert by_id[3]["feature"][-1] == 0.0     # not an image


def test_extract_features_deterministic(assets):
    a = sorted(map(tuple, mm.extract_features(assets).collect()))
    b = sorted(map(tuple, mm.extract_features(assets).collect()))
    assert a == b


def test_resize_is_explicit_stub(assets):
    with pytest.raises(NotImplementedError):
        mm.resize_images(assets, 224, 224)


def test_metadata_summary(assets):
    rows = {r["modality"]: r for r in mm.metadata_summary(assets).collect()}
    assert rows["image"]["n_assets"] == 2
    assert rows["video"]["total_bytes"] is None  # only NULL payloads
