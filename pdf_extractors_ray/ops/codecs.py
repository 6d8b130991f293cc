"""Pure stdlib+numpy media codecs: binary P6 PPM images, 16-bit PCM WAV.

This container ships no external media libraries (no PIL/opencv/ffmpeg),
but these two formats are fully decodable with numpy and the standard
library — so the decode, resize, and frame-sample kernels over them are
REAL (round-trip-tested), not stubs. Heavier codecs (JPEG/MP3/H.264)
remain injectable per-actor handles via ``DecodeStub``'s
``codec_factory`` (see ``ops/multimodal.py``).

Everything here is deterministic: the synthetic corpus generators seed
numpy's RandomState with ``doc_id``, and both encoders are byte-stable.
"""

from __future__ import annotations

import io
import wave

import numpy as np

# ---------------------------------------------------------------------------
# P6 PPM (binary RGB): "P6\n<w> <h>\n255\n" + h*w*3 raw bytes


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 bytes -> (h, w, 3) uint8 (zero-copy view over the body)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary P6 PPM payload")
    # header = three whitespace-separated tokens after the magic: w, h, maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte terminating the header
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    body = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return body.reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downscale so max(h, w) <= max_side (no upscaling).

    Index-gather resampling — one fancy-index per axis, no Python pixel
    loops; output is a fresh contiguous array.
    """
    h, w = arr.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    out_h, out_w = max(1, round(h * scale)), max(1, round(w * scale))
    rows = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    cols = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return np.ascontiguousarray(arr[rows[:, None], cols[None, :]])


# ---------------------------------------------------------------------------
# 16-bit PCM WAV via the stdlib ``wave`` module


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """Mono int16 PCM -> WAV bytes."""
    if pcm.dtype != np.int16:
        raise ValueError(f"expected int16 PCM, got {pcm.dtype}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono int16 PCM, sample rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise ValueError("only mono 16-bit PCM WAV is supported")
        rate = f.getframerate()
        pcm = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
    return pcm, rate


def sample_pcm(pcm: np.ndarray, rate: int, every_ms: int, max_frames: int):
    """Fixed-stride PCM segments: up to ``max_frames`` windows of
    ``every_ms`` starting every ``every_ms`` — [(ts_ms, segment), ...]."""
    step = max(1, rate * every_ms // 1000)
    n = min(max_frames, max(1, len(pcm) // step))
    return [(i * every_ms, pcm[i * step : (i + 1) * step]) for i in range(n)]


# ---------------------------------------------------------------------------
# deterministic synthetic corpus (the driver tables carry no media; real
# pipelines read_parquet a table with a genuine ``payload: binary`` column)

_WAV_RATE = 8000


def synth_image(doc_id: int) -> np.ndarray:
    """Seeded (h, w, 3) uint8 image; dims vary with doc_id."""
    rng = np.random.RandomState(doc_id & 0x7FFFFFFF)
    h, w = 24 + doc_id % 41, 32 + (doc_id * 7) % 53
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def synth_audio(doc_id: int) -> tuple[np.ndarray, int]:
    """Seeded mono int16 PCM, 100-900 ms at 8 kHz."""
    rng = np.random.RandomState(doc_id & 0x7FFFFFFF)
    dur_ms = 100 + (doc_id * 37) % 800
    n = _WAV_RATE * dur_ms // 1000
    return (rng.randint(-20000, 20000, size=n).astype(np.int16), _WAV_RATE)


class StdlibCodec:
    """Injectable REAL codec handle for ``DecodeStub`` (the same
    ``codec_factory`` contract a GPU/ffmpeg handle would satisfy):
    decodes P6 images to true dimensions + pixel stats, WAV audio to true
    duration + RMS. Construction is per actor, decode per payload."""

    def decode(self, payload: bytes, kind: str) -> dict:
        if kind == "image":
            arr = decode_ppm(payload)
            return {
                "width": int(arr.shape[1]),
                "height": int(arr.shape[0]),
                "duration_ms": 0,
                "px_mean": int(arr.mean()),
            }
        pcm, rate = decode_wav(payload)
        return {
            "width": 0,
            "height": 0,
            "duration_ms": int(len(pcm) * 1000 // rate),
            "px_mean": int(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))),
        }
