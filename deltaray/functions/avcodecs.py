"""Pure-python/numpy audio + video codecs — stdlib ``struct`` and numpy
only, same rationale as ``imagecodecs``: the sandbox has no
librosa/ffmpeg, but stubbed decode left the multimodal audio/video
paths untested on real containers.  All formats here are public specs:

- WAV: RIFF/WAVE PCM 16-bit encode + decode (mono or interleaved
  multi-channel).  Spec: Microsoft/IBM RIFF WAVE (public).
- MFCC front-end: frame → Hann window → |rfft|² → mel filterbank
  (HTK ``2595·log10(1 + f/700)`` scale) → log → orthonormal DCT-II.
  Standard published DSP (Davis & Mermelstein 1980); implemented as
  one matmul chain over all frames at once.
- AVI: RIFF 'AVI ' container with an MJPEG video stream — each frame
  an independent baseline JPEG from ``imagecodecs``.  The decoder
  indexes ``movi`` chunks first, so sampling k frames decodes ONLY
  those k (the at-scale frame-sampling story: byte-range reads into a
  100 MB payload, not a full transcode).  Spec: Microsoft AVI RIFF
  (public).
- AVI raw-DIB variant: the same container with UNCOMPRESSED 24-bit
  BI_RGB frames ('00db' chunks, bottom-up BGR rows padded to 4 bytes —
  the classic "DIB " fccHandler).  Lossless, so decoded pixels equal
  the encoder input bit-for-bit — the variant the driver's hash-exact
  video oracle runs on.  ``avi_video_format`` probes the stream header
  so the sampler dispatches per payload.
"""

from __future__ import annotations

import struct

import numpy as np

from deltaray.functions.imagecodecs import decode_jpeg, encode_jpeg

# ============================================================== WAV

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, ch) int16 (or float in [-1, 1]) → RIFF/WAVE PCM16."""
    s = np.asarray(samples)
    if s.dtype.kind == "f":
        s = np.clip(np.round(s * 32767.0), -32768, 32767).astype(np.int16)
    s = s.astype("<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → ((n, ch) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, ch, pcm = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            tag, ch, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if tag != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 WAV supported (tag={tag}, bits={bits})")
        elif cid == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(pcm, "<i2").reshape(-1, ch), rate


def synth_wav(duration_ms: int, rate: int, seed: int,
              n_tones: int = 3) -> bytes:
    """Deterministic test audio: a seeded mixture of sine tones + noise."""
    rng = np.random.default_rng(seed)
    n = max(1, rate * duration_ms // 1000)
    t = np.arange(n) / rate
    sig = np.zeros(n)
    for _ in range(n_tones):
        f = rng.uniform(80, min(4000, rate / 2 * 0.9))
        sig += rng.uniform(0.1, 0.4) * np.sin(
            2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    sig += 0.02 * rng.standard_normal(n)
    return encode_wav(np.clip(sig, -1, 1), rate)


# ============================================================== MFCC

def _mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_inv(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def _mel_filterbank(n_mels: int, n_fft: int, rate: int) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters on the HTK mel scale."""
    pts = _mel_inv(np.linspace(_mel(0.0), _mel(rate / 2.0), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / rate).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        if c > lo:
            fb[m - 1, lo:c] = (np.arange(lo, c) - lo) / (c - lo)
        if hi > c:
            fb[m - 1, c:hi] = (hi - np.arange(c, hi)) / (hi - c)
    return fb


def mfcc(samples: np.ndarray, rate: int, n_mfcc: int = 13,
         n_mels: int = 26, frame_ms: int = 25, hop_ms: int = 10
         ) -> np.ndarray:
    """(n,) or (n, ch) PCM → (n_frames, n_mfcc) float32.

    Multi-channel input is averaged to mono first.  One vectorized
    matmul chain over all frames — no per-frame Python loop."""
    # dtype sniff BEFORE the float cast (post-cast kind is always 'f'):
    # int PCM always normalizes, float only when clearly un-normalized —
    # near-silent int16 (peak <= 1) must still divide by 32768
    was_int = np.asarray(samples).dtype.kind != "f"
    s = np.asarray(samples, np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)
    if was_int or np.abs(s).max(initial=1.0) > 1.5:
        s = s / 32768.0
    flen = max(8, rate * frame_ms // 1000)
    hop = max(1, rate * hop_ms // 1000)
    if len(s) < flen:
        s = np.pad(s, (0, flen - len(s)))
    n_frames = 1 + (len(s) - flen) // hop
    idx = np.arange(flen)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = s[idx] * np.hanning(flen)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2 / flen
    fb = _mel_filterbank(n_mels, flen, rate)
    logmel = np.log(np.maximum(power @ fb.T, 1e-10))
    # orthonormal DCT-II over the mel axis
    k = np.arange(n_mels)
    basis = np.cos(np.pi * np.outer(np.arange(n_mfcc), (2 * k + 1) / (2 * n_mels)))
    basis[0] *= np.sqrt(1.0 / n_mels)
    basis[1:] *= np.sqrt(2.0 / n_mels)
    return (logmel @ basis.T).astype(np.float32)


# ============================================================== AVI (MJPEG)

def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """List of (h, w, 3) uint8 frames → AVI bytes with one MJPEG video
    stream ('00dc' chunks) and an idx1 index."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    maxbuf = max(len(j) for j in jpegs)

    def lst(kind: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", len(body) + 4) + kind + body

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    avih = struct.pack("<14I", 1_000_000 // fps, maxbuf * fps, 0, 0x10,
                       len(frames), 0, 1, maxbuf, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
            1, fps, 0, len(frames), maxbuf, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame — offset is relative to the 'movi' fourcc
    idx, off = b"", 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def index_avi_frames(data: bytes) -> list[tuple[int, int]]:
    """AVI bytes → [(payload_offset, size)] for each video frame chunk.

    Walks the RIFF tree to the 'movi' list and indexes '..dc'/'..db'
    chunks — O(#frames) header reads, no frame decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
            if cid == b"LIST":
                kind = data[pos + 8:pos + 12]
                if kind in (b"movi", b"rec "):
                    walk(pos + 12, pos + 8 + ln)
            elif cid[2:4] in (b"dc", b"db"):
                frames.append((pos + 8, ln))
            pos += 8 + ln + (ln & 1)

    walk(12, len(data))
    return frames


def decode_avi_frame(data: bytes, offset: int, size: int) -> np.ndarray:
    """Decode a single MJPEG frame located by ``index_avi_frames``."""
    return decode_jpeg(data[offset:offset + size])


def encode_avi_raw(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """List of (h, w, 3) uint8 RGB frames → AVI bytes with one
    UNCOMPRESSED 24-bit BI_RGB stream ('00db' chunks: bottom-up BGR
    rows, each padded to a 4-byte boundary) and an idx1 index."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    dibs = []
    for f in frames:
        bgr = np.ascontiguousarray(f[::-1, :, ::-1])    # flip + RGB→BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w * 3] = bgr.reshape(h, w * 3)
        dibs.append(rows.tobytes())
    maxbuf = stride * h

    def lst(kind: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", len(body) + 4) + kind + body

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    avih = struct.pack("<14I", 1_000_000 // fps, maxbuf * fps, 0, 0x10,
                       len(frames), 0, 1, maxbuf, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
            1, fps, 0, len(frames), maxbuf, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24,
                       b"\x00\x00\x00\x00",             # BI_RGB
                       maxbuf, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00db", d) for d in dibs)
    movi = lst(b"movi", movi_body)
    idx, off = b"", 4
    for d in dibs:
        idx += b"00db" + struct.pack("<III", 0x10, off, len(d))
        off += 8 + len(d) + (len(d) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_video_format(data: bytes) -> tuple[str, int, int]:
    """AVI bytes → ("MJPG" | "DIB", width, height) from the first video
    stream-format header (BITMAPINFOHEADER in the 'strf' chunk) — a
    header walk, no frame reads."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    found: list[tuple[str, int, int]] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end and not found:
            cid = data[pos:pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
            if cid == b"LIST":
                kind = data[pos + 8:pos + 12]
                if kind in (b"hdrl", b"strl"):
                    walk(pos + 12, pos + 8 + ln)
            elif cid == b"strf" and ln >= 20:
                body = data[pos + 8:pos + 8 + ln]
                _, w, h = struct.unpack("<Iii", body[:12])
                comp = body[16:20]
                codec = "MJPG" if comp == b"MJPG" else "DIB"
                found.append((codec, int(w), abs(int(h))))
            pos += 8 + ln + (ln & 1)

    walk(12, len(data))
    if not found:
        raise ValueError("AVI missing a video strf header")
    return found[0]


def decode_avi_frame_raw(data: bytes, offset: int, size: int,
                         w: int, h: int) -> np.ndarray:
    """Decode one uncompressed BI_RGB '00db' frame located by
    ``index_avi_frames`` → (h, w, 3) uint8 RGB."""
    stride = (w * 3 + 3) // 4 * 4
    if size < stride * h:
        raise ValueError(f"raw frame truncated: {size} < {stride * h}")
    rows = np.frombuffer(data, np.uint8, count=stride * h,
                         offset=offset).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1]                           # flip + BGR→RGB


def synth_avi(n_frames: int, w: int, h: int, seed: int,
              fps: int = 10) -> bytes:
    """Deterministic test video: a bright square orbiting a noisy field
    (per-frame brightness varies, so sampled features are non-trivial)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 96, size=(h, w, 3), dtype=np.uint8)
    frames = []
    for i in range(n_frames):
        f = base.copy()
        cx = int((0.5 + 0.4 * np.cos(2 * np.pi * i / n_frames)) * (w - 1))
        cy = int((0.5 + 0.4 * np.sin(2 * np.pi * i / n_frames)) * (h - 1))
        f[max(0, cy - 2):cy + 3, max(0, cx - 2):cx + 3] = 230 + i % 16
        frames.append(f)
    return encode_avi_mjpeg(frames, fps=fps)
