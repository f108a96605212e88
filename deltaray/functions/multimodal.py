"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

Image decode is REAL for uncompressed formats that need no external
libraries — binary PPM (P6) and 24-bit uncompressed BMP are parsed and
bilinearly resized in pure numpy; compressed formats (JPEG/PNG) and
audio/video decode are STUBBED (no PIL/ffmpeg in this container):
strict mode raises, default mode produces a deterministic fake from the
payload bytes.  Everything Ray-side is real and tested: schema
handling, small-batch sizing for wide binary rows, actor signature,
output layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deltaray.util import auto_concurrency

# ------------------------------------------------------ real codecs (pure numpy)
def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6) encoder — (h, w, 3) uint8 → bytes."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img.astype(np.uint8)).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) decoder (comments supported) → (h, w, 3) uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    idx, tokens = 2, []
    while len(tokens) < 3:
        while data[idx:idx + 1].isspace():
            idx += 1
        if data[idx:idx + 1] == b"#":
            while data[idx:idx + 1] not in (b"\n", b""):
                idx += 1
            continue
        start = idx
        while not data[idx:idx + 1].isspace():
            idx += 1
        tokens.append(int(data[start:idx]))
    idx += 1  # the single whitespace after maxval
    w, h, _maxv = tokens
    arr = np.frombuffer(data, np.uint8, count=w * h * 3, offset=idx)
    return arr.reshape(h, w, 3)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit bottom-up BMP decoder → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(data, np.uint8, count=stride * abs(h), offset=off)
    img = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up storage
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR → RGB


def resize_bilinear(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Pure-numpy bilinear resize of (h, w, c) uint8 → (th, tw, c)."""
    h, w = img.shape[:2]
    ys = np.clip((np.arange(th) + 0.5) * h / th - 0.5, 0, h - 1)
    xs = np.clip((np.arange(tw) + 0.5) * w / tw - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    f = img.astype(np.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).round().astype(np.uint8)


IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),     # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096,
                      fmt: str = "ppm") -> pa.Table:
    """Deterministic media table.  ``fmt="ppm"`` writes REAL binary-PPM
    payloads (gradient + seeded noise images, genuinely decodable);
    ``fmt="fake"`` writes opaque random bytes for the stub path."""
    rng = np.random.default_rng(seed)
    payloads, widths, heights = [], [], []
    for i in range(n):
        if fmt == "ppm":
            w = int(rng.integers(16, 64))
            h = int(rng.integers(16, 64))
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                (255 * xx / max(1, w - 1)),
                (255 * yy / max(1, h - 1)),
                rng.integers(0, 256, size=(h, w)),
            ], axis=-1).astype(np.uint8)
            payloads.append(encode_ppm(img))
        else:
            w = int(rng.integers(64, 2048))
            h = int(rng.integers(64, 2048))
            payloads.append(rng.integers(0, 256, size=payload_bytes,
                                         dtype=np.uint8).tobytes())
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array([f"img{i:08d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/ppm" if fmt == "ppm" else "image/fake"] * n),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
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
        mimes = batch["mime"].to_pylist() if "mime" in batch.column_names \
            else [""] * batch.num_rows
        feats = []
        for buf, mime in zip(batch["payload"], mimes):
            raw = buf.as_py()
            if mime == "image/ppm":
                img = decode_ppm(raw)
            elif mime == "image/bmp":
                img = decode_bmp(raw)
            elif self.strict:
                raise NotImplementedError(
                    f"decoding {mime or 'unknown'} requires PIL/opencv — "
                    "not available here; only PPM/BMP decode natively"
                )
            else:
                # stub path for compressed formats: deterministic fake
                # "embedding" from byte-histogram moments
                b = np.frombuffer(raw, dtype=np.uint8)
                chunks = np.array_split(b.astype(np.float32), 8)
                feats.append(np.array([c.mean() for c in chunks],
                                      dtype=np.float32))
                continue
            # REAL path: resize + 8-dim feature (channel means/stds,
            # gray-gradient energy, aspect ratio)
            r = resize_bilinear(img, self.target[0], self.target[1])
            f = r.astype(np.float32)
            gray = f.mean(axis=2)
            grad = float(np.abs(np.diff(gray, axis=0)).mean()
                         + np.abs(np.diff(gray, axis=1)).mean())
            feats.append(np.array(
                [*f.mean(axis=(0, 1)), *f.std(axis=(0, 1)), grad,
                 img.shape[1] / max(1, img.shape[0])], dtype=np.float32))
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
