"""Pure stdlib+numpy media codecs: P6 PPM and PNG images, 16-bit PCM WAV.

This container ships no external media libraries (no PIL/opencv/ffmpeg),
but these formats are fully decodable with numpy and the standard
library (PNG: zlib inflate + per-filter unfiltering incl. Paeth) — so
the decode, resize, and frame-sample kernels over them are REAL
(round-trip-tested), not stubs. Heavier codecs (JPEG/MP3/H.264) remain
injectable per-actor handles via ``DecodeStub``'s ``codec_factory``
(see ``ops/multimodal.py``). Reference analog for the image chain: the
playground CV pipeline (``playground/try_cv.py:37-98``).

Everything here is deterministic: the synthetic corpus generators seed
numpy's RandomState with ``doc_id``, and all encoders are byte-stable.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

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
# PNG (ISO/IEC 15948): 8-bit gray / RGB / RGBA, non-interlaced.
# Decode = chunk walk (CRC-checked) -> zlib inflate -> per-row unfilter.
# Sub/Up are vectorized outright; Sub additionally collapses to a mod-256
# cumsum over pixels. Average/Paeth carry an intra-row sequential
# dependence, resolved pixel-at-a-time with the channel vector as the
# unit (w steps of bpp-wide numpy ops, no per-byte Python).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor over int16 channel vectors (a=left, b=up, c=up-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, {1,3,4}) uint8 -> PNG bytes.

    ``filter_type`` (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) is applied
    to EVERY row — filtering forward is fully vectorized for all five
    types (the predictors read raw, not reconstructed, data) — so tests
    can round-trip each unfilter path."""
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    if filter_type not in range(5):
        raise ValueError(f"bad filter type {filter_type}")

    raw = arr.astype(np.int16)
    left = np.zeros_like(raw)
    left[:, 1:] = raw[:, :-1]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, 1:] = raw[:-1, :-1]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - up
    elif filter_type == 3:
        filt = raw - (left + up) // 2
    else:
        filt = raw - _paeth(left, up, upleft)
    body = np.empty((h, 1 + w * ch), dtype=np.uint8)
    body[:, 0] = filter_type
    body[:, 1:] = (filt % 256).astype(np.uint8).reshape(h, w * ch)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, ch) uint8 (gray decodes to ch=1)."""
    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = len(_PNG_MAGIC), [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt_method, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or comp or filt_method or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} interlace={interlace}); "
            "8-bit gray/RGB/RGBA non-interlaced only"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    body = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(body) != h * (1 + stride):
        raise ValueError("PNG body length mismatch")
    body = body.reshape(h, 1 + stride)
    ftypes = body[:, 0]
    rows = body[:, 1:].astype(np.int16)  # int16: filter math needs signed headroom
    out = np.empty((h, w, ch), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f, row = int(ftypes[y]), rows[y]
        if f == 0:
            rec = row
        elif f == 1:
            # recon[x] = filt[x] + recon[x-bpp]: a prefix sum over pixels
            rec = np.cumsum(row.reshape(w, ch), axis=0, dtype=np.int64).reshape(stride)
        elif f == 2:
            rec = row + prior
        elif f in (3, 4):
            rec = np.empty(stride, dtype=np.int16)
            left = np.zeros(ch, dtype=np.int16)
            pr = prior.reshape(w, ch)
            rw = row.reshape(w, ch)
            rc = rec.reshape(w, ch)
            upleft = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                if f == 3:
                    pred = (left + pr[x]) // 2
                else:
                    pred = _paeth(left, pr[x], upleft)
                rc[x] = (rw[x] + pred) % 256
                left = rc[x].astype(np.int16)
                upleft = pr[x]
        else:
            raise ValueError(f"bad PNG filter type {f} in row {y}")
        rec = (rec % 256).astype(np.uint8)
        out[y] = rec.reshape(w, ch)
        prior = rec.astype(np.int16)
    return out


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff-and-decode: P6 PPM or PNG -> (h, w, 3) uint8 RGB.

    The production image stages (thumbnail, dHash, OCR raster) call this
    so a corpus can mix container formats per payload; gray broadcasts
    to RGB and RGBA drops alpha so downstream kernels see one layout."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(_PNG_MAGIC):
        arr = decode_png(payload)
        if arr.shape[2] == 1:
            return np.ascontiguousarray(np.repeat(arr, 3, axis=2))
        if arr.shape[2] == 4:
            return np.ascontiguousarray(arr[:, :, :3])
        return arr
    raise ValueError("unrecognized image payload (expected P6 PPM or PNG)")


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
    decodes P6/PNG images (sniffed) to true dimensions + pixel stats,
    WAV audio to true duration + RMS. Construction is per actor, decode
    per payload."""

    def decode(self, payload: bytes, kind: str) -> dict:
        if kind == "image":
            arr = decode_image(payload)
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
