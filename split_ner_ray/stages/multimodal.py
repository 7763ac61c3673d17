"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / resize / frame-sample / feature-extract as actor-pool stages.

Design (per the engine's training-data-pipeline mandate): media are opaque
``binary`` columns with a JSON-ish metadata column; every transform is a
``map_batches`` actor stage with small batches (payloads are large), so the
Ray-side plumbing — schema, batch size, actor signature, output layout —
is real and tested. The image/audio codec libraries are NOT in this
container, so the codec boundary is explicit: ``RealCodecDecoder`` raises
NotImplementedError unless PIL/soundfile import (they don't here), and the
default ``SyntheticCodecDecoder`` decodes the deterministic raw format
written by ``synth_media_table`` (header: width, height, channels,
n_frames + raw uint8 planes). Swapping in a real codec touches exactly one
class.
"""

from __future__ import annotations

import hashlib
import json
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("kind", pa.string()),  # image | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON: {width, height, channels, n_frames}
    ]
)

_MAGIC = b"SNRM"  # split-ner-ray media, version 1


def encode_frames(frames: np.ndarray) -> bytes:
    """(n_frames, h, w, c) uint8 -> deterministic raw payload."""
    n, h, w, c = frames.shape
    return _MAGIC + struct.pack("<IIII", n, h, w, c) + frames.tobytes()


def synth_media_table(n_items: int, seed: int = 42) -> pa.Table:
    """Deterministic media fixture: small images + 4-frame 'videos'."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n_items):
        rng = np.random.RandomState(seed * 1_000 + i)
        kind = "video" if i % 3 == 0 else "image"
        n_frames = 4 if kind == "video" else 1
        h, w, c = 16 + (i % 3) * 8, 16 + (i % 5) * 8, 3
        frames = rng.randint(0, 256, size=(n_frames, h, w, c), dtype=np.uint8)
        rows["item_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(encode_frames(frames))
        rows["meta"].append(json.dumps({"width": w, "height": h, "channels": c, "n_frames": n_frames}))
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class SyntheticCodecDecoder:
    """Decodes the deterministic raw format (the sandbox 'codec')."""

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] != _MAGIC:
            raise ValueError("unknown payload format")
        n, h, w, c = struct.unpack("<IIII", payload[4:20])
        return np.frombuffer(payload[20:], dtype=np.uint8).reshape(n, h, w, c)


class RealCodecDecoder:
    """Real-codec boundary: requires PIL (images) — absent in this
    container, so construction fails loudly instead of silently degrading."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image codec libraries are not installed in this environment; "
                "use SyntheticCodecDecoder or install Pillow"
            ) from e

    def decode(self, payload: bytes) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class MediaFeatures:
    """Actor stage: decode -> per-item features (mean/std per channel,
    content hash). Decoder constructed ONCE per actor; batches stay small
    because payloads are large (batch_size is the memory knob)."""

    def __init__(self, decoder_cls=SyntheticCodecDecoder):
        self.decoder = decoder_cls()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        means, stds, hashes, frames_out = [], [], [], []
        for payload in batch["payload"]:
            arr = self.decoder.decode(payload)
            means.append([float(x) for x in arr.mean(axis=(0, 1, 2))])
            stds.append([float(x) for x in arr.std(axis=(0, 1, 2))])
            hashes.append(hashlib.blake2b(payload, digest_size=8).hexdigest())
            frames_out.append(int(arr.shape[0]))
        return pd.DataFrame(
            {
                "item_id": batch["item_id"].astype("int64"),
                "kind": batch["kind"],
                "n_frames": pd.array(frames_out, dtype="int64"),
                "channel_mean": means,
                "channel_std": stds,
                "content_hash": hashes,
            }
        )


class MediaResize:
    """Actor stage: decode -> nearest-neighbor resize -> re-encode payload
    (output layout identical to input, so stages compose)."""

    def __init__(self, out_h: int = 8, out_w: int = 8, decoder_cls=SyntheticCodecDecoder):
        self.decoder = decoder_cls()
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        payloads, metas = [], []
        for payload in batch["payload"]:
            arr = self.decoder.decode(payload)
            n, h, w, c = arr.shape
            yi = (np.arange(self.out_h) * h // self.out_h).astype(int)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(int)
            small = arr[:, yi][:, :, xi]
            payloads.append(encode_frames(np.ascontiguousarray(small)))
            metas.append(json.dumps({"width": self.out_w, "height": self.out_h, "channels": c, "n_frames": n}))
        out = batch.copy()
        out["payload"] = payloads
        out["meta"] = metas
        return out


def frame_sample(ds, every: int = 2, *, decoder_cls=SyntheticCodecDecoder,
                 concurrency=None, batch_size: int = 32):
    """Actor-pool stage: keep every ``every``-th frame of video payloads."""

    class Sampler:
        def __init__(self):
            self.decoder = decoder_cls()

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            payloads, metas = [], []
            for payload, meta in zip(batch["payload"], batch["meta"]):
                arr = self.decoder.decode(payload)
                kept = np.ascontiguousarray(arr[::every])
                payloads.append(encode_frames(kept))
                m = json.loads(meta)
                m["n_frames"] = int(kept.shape[0])
                metas.append(json.dumps(m))
            out = batch.copy()
            out["payload"] = payloads
            out["meta"] = metas
            return out

    from .pools import pool_size

    return ds.map_batches(Sampler, batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency or pool_size(0.5), num_cpus=0.5)


def extract_features(ds, *, decoder_cls=SyntheticCodecDecoder, concurrency=None,
                     batch_size: int = 32):
    from .pools import pool_size

    return ds.map_batches(
        MediaFeatures,
        fn_constructor_kwargs={"decoder_cls": decoder_cls},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency or pool_size(0.5),
        num_cpus=0.5,
    )


def resize(ds, out_h: int = 8, out_w: int = 8, *, decoder_cls=SyntheticCodecDecoder,
           concurrency=None, batch_size: int = 32):
    from .pools import pool_size

    return ds.map_batches(
        MediaResize,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w, "decoder_cls": decoder_cls},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency or pool_size(0.5),
        num_cpus=0.5,
    )
