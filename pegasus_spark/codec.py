"""Image codecs — pure numpy + zlib (no Pillow in the sandbox).

Two formats per BASELINE.json input_hint / FIXTURES.md §1:

- ``png``  — real, spec-compliant PNG (8-bit RGB, color type 2, filter 0),
  losslessly round-trippable and readable by any external PNG tool.
- ``qnt``  — a deliberately lossy quantizing codec (6 bits/channel) whose
  reconstruction error is bounded by construction: per-channel error ∈
  {-2,-1,0,+1} → MSE ≤ 1.5 → PSNR ≥ 10·log10(255²/1.5) ≈ 46.5 dB,
  comfortably above the 40 dB per-row invariant (BASELINE.json:15).

Also: ``psnr`` and the 64-bit average-hash ``phash`` used in the corpus
schema. The reference crawler (shriphani/pegasus) stores raw HTML bodies
(SURVEY.md §1.1 D7); this graft's payloads are image+caption pairs, so
decode/validate replaces its parse stage (SURVEY.md §2 O7).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG (color type 2, filter 0)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 prepended to each scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`png_encode` (supports filters 0-2)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, _ = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * 3
    raw = raw.reshape(h, stride)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    for y in range(h):
        ft = raw[y, 0]
        line = raw[y, 1:].astype(np.int16)
        if ft == 0:
            out[y] = line.astype(np.uint8)
        elif ft == 1:  # Sub
            acc = line.copy()
            for x in range(3, w * 3):
                acc[x] = (acc[x] + acc[x - 3]) & 0xFF
            out[y] = acc.astype(np.uint8)
        elif ft == 2:  # Up
            out[y] = ((line + out[y - 1]) & 0xFF).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {ft}")
    return out.reshape(h, w, 3)


_QNT_MAGIC = b"QNT1"


def qnt_encode(pixels: np.ndarray) -> bytes:
    """Lossy codec: quantize to 6 bits/channel, zlib the plane.

    Reconstruction is ``(q << 2) | 2`` so error per sample is in
    {-2,-1,0,+1}; worst-case MSE = (4+1+0+1)/4 = 1.5 → PSNR ≥ 46.5 dB.
    """
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    q = (pixels >> 2).astype(np.uint8)
    return _QNT_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def qnt_decode(data: bytes) -> np.ndarray:
    if data[:4] != _QNT_MAGIC:
        raise ValueError("not QNT1")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return ((q << 2) | 2).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "qnt":
        return qnt_encode(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "qnt":
        return qnt_decode(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash(pixels: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8×8 block-mean downsample →
    bit per cell (≥ mean), signed int64 (matches corpus ``phash:int64``)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells >= cells.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v
