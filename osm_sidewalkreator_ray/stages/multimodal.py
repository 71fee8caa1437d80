"""Multimodal binary columns: decode / feature-extract / frame-sample
stages with real Ray plumbing and stubbed codecs.

Per the build brief, image/audio/video payloads are opaque ``binary``
columns with typed metadata; the decode step is an actor-pool
``map_batches`` stage. The actual codecs (PIL/ffmpeg/librosa) are NOT
in this container, so decoding is stubbed behind a deterministic fake
(`fake=True`, the default: a seeded ndarray derived from the payload
bytes, so pipelines are testable end-to-end) or a clearly-marked
``NotImplementedError`` (`fake=False`: the production wiring point).
Everything around the stub — schema, batch size, actor signature,
output layout — is real and tested:

- wide binary rows -> small batches (``batch_size`` ~64)
- decode state (the codec) constructed once per actor in ``__init__``
- payload column dropped on output; only compact features leave the
  stage (SURVEY.md §7.4 wide-row rule)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio
    ("width", pa.int32()),          # image metadata
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),    # audio metadata
    ("payload", pa.binary()),
])


def _seed_from_bytes(b: bytes) -> int:
    return int.from_bytes(hashlib.sha1(b).digest()[:4], "little")


class ImageDecoder:
    """Actor-pool stage: image payload -> (mean_luma, edge_score,
    thumb_8x8 as 64 float list). ``fake=True`` produces a deterministic
    pseudo-decode; ``fake=False`` raises NotImplementedError at the
    exact call site where a real codec (PIL) plugs in."""

    def __init__(self, fake: bool = True, thumb: int = 8):
        self.fake = fake
        self.thumb = thumb
        # real path would do: from PIL import Image; self.codec = Image

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image codec not available in this container; "
                "plug PIL.Image.open here")
        rng = np.random.RandomState(_seed_from_bytes(payload))
        return rng.randint(0, 256, size=(height, width),
                           dtype=np.uint8)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"media_id": [], "mean_luma": [], "edge_score": [],
                "thumb": []}
        for _, r in batch.iterrows():
            img = self._decode(r["payload"], int(r["width"]),
                               int(r["height"]))
            rows["media_id"].append(int(r["media_id"]))
            rows["mean_luma"].append(float(img.mean()))
            gx = np.abs(np.diff(img.astype(np.int32), axis=1)).mean()
            rows["edge_score"].append(float(gx))
            h, w = img.shape
            th = self.thumb
            ys = (np.arange(th) * h) // th
            xs = (np.arange(th) * w) // th
            rows["thumb"].append(img[np.ix_(ys, xs)].astype(
                np.float32).ravel().tolist())
        return pd.DataFrame(rows)


class AudioFrameSampler:
    """Actor-pool stage: audio payload -> fixed number of frame-energy
    features. Same stub contract as ImageDecoder."""

    def __init__(self, fake: bool = True, n_frames: int = 16):
        self.fake = fake
        self.n_frames = n_frames

    def _decode(self, payload: bytes, sample_rate: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "audio codec not available; plug soundfile/librosa here")
        rng = np.random.RandomState(_seed_from_bytes(payload))
        return rng.standard_normal(sample_rate)  # 1 s of fake samples

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"media_id": [], "frame_energy": []}
        for _, r in batch.iterrows():
            x = self._decode(r["payload"], int(r["sample_rate"]))
            frames = np.array_split(x, self.n_frames)
            rows["media_id"].append(int(r["media_id"]))
            rows["frame_energy"].append(
                [float(np.sqrt((f ** 2).mean())) for f in frames])
        return pd.DataFrame(rows)


def synthetic_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table in MEDIA_SCHEMA (payload bytes are a
    pure function of (i, seed))."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    rng = np.random.RandomState(seed)
    for i in range(n):
        kind = "image" if i % 2 == 0 else "audio"
        payload = hashlib.sha1(f"{seed}/{i}".encode()).digest() * 32
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["width"].append(int(rng.randint(16, 64)))
        rows["height"].append(int(rng.randint(16, 64)))
        rows["sample_rate"].append(8000)
        rows["payload"].append(payload)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def media_features(n: int = 200, seed: int = 42):
    """End-to-end multimodal pipeline over the synthetic media table:
    split by kind, decode via the matching actor pool (small batches,
    payload dropped), union the compact features."""
    import ray.data as rd

    ds = rd.from_arrow(synthetic_media(n, seed))
    images = ds.filter(expr="kind == 'image'").map_batches(
        ImageDecoder, batch_format="pandas", batch_size=64,
        concurrency=(1, 2))

    def img_norm(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "media_id": b["media_id"],
            "feature": b["mean_luma"].round(4),
            "kind": "image"})

    audio = ds.filter(expr="kind == 'audio'").map_batches(
        AudioFrameSampler, batch_format="pandas", batch_size=64,
        concurrency=(1, 2))

    def aud_norm(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "media_id": b["media_id"],
            "feature": b["frame_energy"].map(
                lambda f: round(float(np.mean(f)), 4)),
            "kind": "audio"})

    out = images.map_batches(img_norm, batch_format="pandas").union(
        audio.map_batches(aud_norm, batch_format="pandas"))
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)
