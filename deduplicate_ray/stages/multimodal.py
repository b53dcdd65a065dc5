"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video content is carried as an opaque ``binary`` column with
typed metadata columns (``media_type``, ``width``/``height``/
``sample_rate``...). Decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages: codec state loads once per actor
(``__init__``), batches stream through ``__call__``.

Image decode is REAL when PIL imports (grayscale-thumbnail features,
``ImageFeaturizer._features_pil``; covered by a skipped-if-no-PIL test)
and falls back to a deterministic fake otherwise, so the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
real and tested even in codec-less containers. Audio/video frame
sampling remains stubbed (no libav/ffmpeg anywhere reachable); swap
``_decode_fake`` for the library call to productionize; nothing else
changes.

Scale note: binary payloads make rows wide — these stages run with small
``batch_size`` (default 64) so batch x concurrency stays inside a worker
heap, and payloads are dropped as soon as features are extracted.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.string()),
    ("media_type", pa.string()),   # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta", pa.string()),          # JSON sidecar (dims, codec, duration...)
])


def _decode_fake(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a repeatable feature
    vector derived from the payload bytes (blake2b expanded). NOT a real
    decode — marked stub; replace with PIL/torchaudio/pyav."""
    if payload is None:
        payload = b""
    out = np.empty(out_dim, dtype=np.float32)
    for i in range(0, out_dim, 8):
        h = hashlib.blake2b(payload + i.to_bytes(4, "big"), digest_size=64).digest()
        vals = np.frombuffer(h, dtype=np.uint64).astype(np.float64)
        n = min(8, out_dim - i)
        out[i:i + n] = ((vals % 10_000) / 10_000.0)[:n]
    return out


class ImageFeaturizer:
    """Actor stage: image payload → feature vector (fixed_size_list<float>).

    __init__ loads the codec once per actor (PIL if available, else the
    deterministic stub)."""

    def __init__(self, out_dim: int = 64, keep_payload: bool = False):
        self.out_dim = out_dim
        self.keep_payload = keep_payload
        try:  # pragma: no cover - not installed in this container
            from PIL import Image  # noqa: F401
            self.backend = "pil"
        except ImportError:
            self.backend = "stub"

    def _features(self, payload: bytes) -> np.ndarray:
        if self.backend == "pil":  # pragma: no cover - no PIL in CI box
            return self._features_pil(payload)
        return _decode_fake(payload, self.out_dim)

    def _features_pil(self, payload: bytes) -> np.ndarray:
        """Real decode (used automatically when PIL imports): grayscale
        thumbnail intensities as the feature vector — decode + resize to
        a g x g grid (g = isqrt(out_dim), remainder zero-padded),
        normalized to [0, 1]. An undecodable payload falls back to the
        deterministic stub so one corrupt image never kills a batch."""
        import io

        from PIL import Image

        try:
            g = max(1, int(np.sqrt(self.out_dim)))
            img = Image.open(io.BytesIO(payload or b"")).convert("L") \
                .resize((g, g))
            flat = (np.asarray(img, dtype=np.float32) / 255.0).reshape(-1)
            out = np.zeros(self.out_dim, dtype=np.float32)
            out[:min(flat.size, self.out_dim)] = flat[:self.out_dim]
            return out
        except Exception:
            return _decode_fake(payload, self.out_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._features(p) for p in payloads]) \
            if payloads else np.zeros((0, self.out_dim), dtype=np.float32)
        fcol = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.out_dim)
        batch = batch.append_column("features", fcol)
        if not self.keep_payload:
            batch = batch.drop_columns(["payload"])
        return batch


class AudioFrameSampler:
    """Actor stage: audio/video payload → N evenly spaced 'frame' feature
    rows (flat_map shape: one input row → n_frames output rows)."""

    def __init__(self, n_frames: int = 4, frame_dim: int = 16):
        self.n_frames = n_frames
        self.frame_dim = frame_dim
        self.backend = "stub"  # no libav in this container

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, feats = [], [], []
        for item, payload in zip(batch.column("item_id").to_pylist(),
                                 batch.column("payload").to_pylist()):
            payload = payload or b""
            step = max(1, len(payload) // self.n_frames)
            for f in range(self.n_frames):
                chunk = payload[f * step:(f + 1) * step]
                ids.append(item)
                frames.append(f)
                feats.append(_decode_fake(chunk, self.frame_dim))
        mat = np.stack(feats) if feats else np.zeros((0, self.frame_dim), np.float32)
        fcol = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), self.frame_dim)
        return pa.table({
            "item_id": pa.array(ids, pa.string()),
            "frame": pa.array(frames, pa.int32()),
            "features": fcol,
        })


def featurize_images(media: rd.Dataset, out_dim: int = 64,
                     concurrency=(1, 4), batch_size: int = 64) -> rd.Dataset:
    """media table → per-item feature vectors (actor pool; small batches —
    binary rows are wide)."""
    return media.map_batches(
        ImageFeaturizer, fn_constructor_kwargs={"out_dim": out_dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def sample_frames(media: rd.Dataset, n_frames: int = 4, frame_dim: int = 16,
                  concurrency=(1, 4), batch_size: int = 64) -> rd.Dataset:
    return media.map_batches(
        AudioFrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "frame_dim": frame_dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def synth_media(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table for tests/benches."""
    rng = np.random.Generator(np.random.PCG64(seed))
    types = ["image", "audio", "video"]
    return pa.Table.from_pydict({
        "item_id": [f"m{i}" for i in range(n)],
        "media_type": [types[i % 3] for i in range(n)],
        "payload": [bytes(rng.integers(0, 256, int(rng.integers(256, 4096)),
                                       dtype=np.uint8)) for _ in range(n)],
        "meta": ['{"w":64,"h":64}'] * n,
    }, schema=MEDIA_SCHEMA)
