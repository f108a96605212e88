"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
container): ``DecodeImage``/``ExtractAudioFeatures`` either raise
``NotImplementedError`` (strict mode) or produce a deterministic fake
derived from the payload bytes (test mode).  Everything Ray-side is
real and tested: schema handling, small-batch sizing for wide binary
rows, actor signature, output layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deltaray.util import auto_concurrency

IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),     # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (binary payloads) for tests/bench."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"img{i:08d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * n),
            "width": pa.array(rng.integers(64, 2048, n, dtype=np.int32)),
            "height": pa.array(rng.integers(64, 2048, n, dtype=np.int32)),
        }
    )


class DecodeImage:
    """Actor-pool stage: decode + resize + feature-extract.

    Real deployments load the codec / model once here (``__init__``); this
    container has no image libs, so ``strict=True`` raises and the default
    produces a deterministic 8-dim feature from the payload bytes.

    Use small ``batch_size`` (e.g. 64) — batches of wide binary rows must
    fit worker heap × concurrency.
    """

    def __init__(self, strict: bool = False, target: tuple[int, int] = (224, 224)):
        self.strict = strict
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL/opencv — not available in this "
                "environment; run with strict=False for the deterministic stub"
            )
        feats = []
        for buf in batch["payload"]:
            b = np.frombuffer(buf.as_py(), dtype=np.uint8)
            # deterministic fake "embedding": byte-histogram moments
            chunks = np.array_split(b.astype(np.float32), 8)
            feats.append(np.array([c.mean() for c in chunks], dtype=np.float32))
        out = batch.drop_columns(["payload"])
        out = out.append_column(
            "resized_w", pa.array([self.target[0]] * len(batch), pa.int32())
        )
        out = out.append_column(
            "resized_h", pa.array([self.target[1]] * len(batch), pa.int32())
        )
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def decode_images(ds, concurrency=None, batch_size: int = 64,
                  strict: bool = False):
    """The plumbing: actor pool, small batches, binary column dropped after
    decode so the wide payload never flows further down the pipeline."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_concurrency(),
    )


AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),       # opaque encoded audio
        ("mime", pa.string()),
        ("sample_rate", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_audio_table(n: int, seed: int = 43, payload_bytes: int = 8192) -> pa.Table:
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"aud{i:08d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/fake"] * n),
            "sample_rate": pa.array(
                rng.choice(np.array([16000, 44100], dtype=np.int32), n)
            ),
            "duration_ms": pa.array(rng.integers(500, 30000, n, dtype=np.int32)),
        }
    )


class ExtractAudioFeatures:
    """Actor-pool stage: audio decode + feature extraction (MFCC-shaped).

    STUB: no audio libs in this container — strict=True raises, default
    yields a deterministic 13-dim pseudo-MFCC from payload byte stats."""

    def __init__(self, strict: bool = False, n_mfcc: int = 13):
        self.strict = strict
        self.n_mfcc = n_mfcc

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires librosa/ffmpeg — not available here; "
                "run with strict=False for the deterministic stub"
            )
        feats = []
        for buf in batch["payload"]:
            b = np.frombuffer(buf.as_py(), dtype=np.uint8).astype(np.float32)
            chunks = np.array_split(b, self.n_mfcc)
            feats.append(np.array([c.std() for c in chunks], dtype=np.float32))
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "mfcc", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


class SampleVideoFrames:
    """Actor-pool stage: sample N frames per video, one OUTPUT ROW PER FRAME
    (flat_map-shaped: a batch of videos fans out to frames).

    STUB decode; real plumbing — deterministic frame offsets from
    duration, wide payload dropped before fan-out so only per-frame
    features flow on."""

    def __init__(self, strict: bool = False, frames_per_video: int = 4):
        self.strict = strict
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video decode requires ffmpeg — not available here; "
                "run with strict=False for the deterministic stub"
            )
        ids, frame_idx, ts_ms, feats = [], [], [], []
        dur = batch["duration_ms"].to_numpy(zero_copy_only=False)
        for i, buf in enumerate(batch["payload"]):
            b = np.frombuffer(buf.as_py(), dtype=np.uint8).astype(np.float32)
            media_id = batch["media_id"][i].as_py()
            for j in range(self.k):
                ids.append(media_id)
                frame_idx.append(j)
                ts_ms.append(int(dur[i]) * j // self.k)
                seg = b[j::self.k]
                feats.append(float(seg.mean()) if len(seg) else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "ts_ms": pa.array(ts_ms, pa.int64()),
                "brightness": pa.array(feats, pa.float32()),
            }
        )


def extract_audio_features(ds, concurrency=None, batch_size: int = 64,
                           strict: bool = False):
    return ds.map_batches(
        ExtractAudioFeatures,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_concurrency(),
    )


def sample_video_frames(ds, concurrency=None, batch_size: int = 32,
                        strict: bool = False):
    return ds.map_batches(
        SampleVideoFrames,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_concurrency(),
    )
