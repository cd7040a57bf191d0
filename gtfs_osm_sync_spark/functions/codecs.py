"""Image codecs + PSNR, numpy-only (no PIL/libjpeg in this environment).

- PNG: a real, spec-conformant encoder/decoder for 8-bit RGB images
  (signature/IHDR/IDAT/IEND, zlib DEFLATE, filter type 0) built on
  stdlib zlib. Files produced here are readable by any PNG reader.
- 'jpeg' (lossy): real JPEG entropy coding needs libjpeg, which is not in
  this container, so the lossy path is a clearly-marked deterministic
  stand-in codec ("JPGQ"): uniform quantization (step 2) + DEFLATE. It is
  genuinely lossy (max error ±1/channel, PSNR ~54 dB >= the 40 dB
  invariant from BASELINE.json input_hint) and bit-deterministic, so the
  per-row decoded-pixel allclose contract is fully testable end to end.
  Swapping in libjpeg later only changes `encode_lossy`/`decode_lossy`.

All functions operate on numpy uint8 arrays of shape (h, w, 3); the
Spark-side plumbing (mapInPandas batches over BinaryType columns) lives
in operators/images.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPGQ_MAGIC = b"JPGQ"
_JPGQ_STEP = 2


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """8-bit RGB ndarray (h, w, 3) -> PNG bytes (filter 0, no interlace)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("png_encode expects uint8 (h, w, 3)")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w, 3). Supports the subset we emit
    (8-bit RGB, filters 0/1/2 tolerated)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("unsupported PNG subtype")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w * 3), dtype=np.uint8)
    for y in range(h):
        line = rows[y, 1:].astype(np.int32)
        f = filters[y]
        if f == 0:
            out[y] = line.astype(np.uint8)
        elif f == 1:  # Sub
            cur = line.copy()
            for x in range(3, w * 3):
                cur[x] = (cur[x] + cur[x - 3]) & 0xFF
            out[y] = cur.astype(np.uint8)
        elif f == 2:  # Up
            prev = out[y - 1].astype(np.int32) if y else 0
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out.reshape(h, w, 3)


def encode_lossy(img: np.ndarray, step: int = _JPGQ_STEP) -> bytes:
    """Deterministic lossy stand-in codec (see module docstring)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_lossy expects uint8 (h, w, 3)")
    h, w = img.shape[:2]
    q = (img.astype(np.uint16) + step // 2) // step
    q = np.clip(q, 0, 255 // step).astype(np.uint8)
    return (
        _JPGQ_MAGIC
        + struct.pack(">IIB", w, h, step)
        + zlib.compress(q.tobytes(), 6)
    )


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _JPGQ_MAGIC:
        raise ValueError("not a JPGQ payload")
    w, h, step = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)
    return np.clip(q.astype(np.uint16) * step, 0, 255).astype(np.uint8)


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "jpeg":
        return encode_lossy(img)
    raise NotImplementedError(
        f"fmt {fmt!r}: real JPEG/WebP codecs need native libs not present in "
        "this container; only 'png' (real) and 'jpeg' (deterministic lossy "
        "stand-in) are implemented"
    )


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    raise NotImplementedError(f"fmt {fmt!r} not supported")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
