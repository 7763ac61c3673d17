"""Multimodal plumbing tests: schema, actor stages, composition, codec gate."""

from __future__ import annotations

import json

import numpy as np
import pytest

from split_ner_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    MediaFeatures,
    RealCodecDecoder,
    SyntheticCodecDecoder,
    encode_frames,
    extract_features,
    frame_sample,
    resize,
    synth_media_table,
)


def test_payload_roundtrip():
    frames = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    out = SyntheticCodecDecoder().decode(encode_frames(frames))
    assert np.array_equal(out, frames)


def test_real_codec_is_gated():
    with pytest.raises(NotImplementedError, match="not installed"):
        RealCodecDecoder()


def test_media_pipeline(ray_session):
    import ray.data as rd

    tbl = synth_media_table(30)
    assert tbl.schema.equals(MEDIA_SCHEMA)
    ds = rd.from_arrow(tbl)

    feats = extract_features(ds).to_pandas().sort_values("item_id")
    assert len(feats) == 30
    assert all(len(v) == 3 for v in feats["channel_mean"])
    assert feats[feats["kind"] == "video"]["n_frames"].eq(4).all()
    assert feats["content_hash"].nunique() == 30

    # resize -> features composes (output layout == input layout)
    small = resize(ds, out_h=8, out_w=8)
    f2 = extract_features(small).to_pandas().sort_values("item_id")
    metas = [json.loads(m) for m in small.to_pandas()["meta"]]
    assert all(m["width"] == 8 and m["height"] == 8 for m in metas)
    # mean is roughly preserved by nearest-neighbor downsampling
    a = np.array(feats.iloc[0]["channel_mean"])
    b = np.array(f2.iloc[0]["channel_mean"])
    assert np.abs(a - b).max() < 20

    # frame sampling halves video frames, images keep their single frame
    sampled = frame_sample(ds, every=2)
    f3 = extract_features(sampled).to_pandas().sort_values("item_id")
    assert f3[f3["kind"] == "video"]["n_frames"].eq(2).all()
    assert f3[f3["kind"] == "image"]["n_frames"].eq(1).all()
