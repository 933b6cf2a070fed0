"""Deterministic image payload generation + pure-numpy PNG codec + phash.

The crawl's landing table is ``images(image_id, bytes, w, h, fmt, caption,
phash)`` per BASELINE.json input_hint. The sandbox has no PIL/libjpeg, so:

- PNG is REAL: encoded/decoded here with zlib + numpy (8-bit RGB, filter 0
  on encode; filters 0-2 supported on decode). The per-row invariant
  "decoded-pixel allclose" (the analog of the reference's tolerance
  equality, /root/reference/compositionMatcher.py:60) runs on actual bytes.
- JPEG is a STUB: :func:`jpeg_encode`/:func:`jpeg_decode` raise
  ``NotImplementedError`` — the Spark-side plumbing (binary column, Arrow
  batches, schema) is identical for both formats and is tested through the
  PNG path; swap in a real codec on a cluster with libjpeg available.

All generation is seeded from md5 of the URL — zero wall-clock/randomness
dependence, so any two runs (or two parallelism levels) produce
byte-identical tables.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..functions.hashes import h60

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as PNG (filter 0 rows)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # single insert of the filter-type column beats h per-row concats
    filt = np.zeros((h, 1), dtype=np.uint8)
    raw = np.concatenate([filt, arr.reshape(h, w * 3)], axis=1).tobytes()
    # level 1: the fetch stage encodes one image per URL — compression level
    # is the dominant per-row cost and ratio is irrelevant for synthetic data
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw, 1)) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit RGB PNG produced by any filter-0/1/2 encoder."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for i in range(h):
        ftype = raw[i * (stride + 1)]
        row = np.frombuffer(raw[i * (stride + 1) + 1 : (i + 1) * (stride + 1)], dtype=np.uint8)
        if ftype == 0:
            cur = row.copy()
        elif ftype == 2:  # Up
            cur = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 1:  # Sub
            cur = row.copy().reshape(w, 3)
            for x in range(1, w):
                cur[x] = cur[x] + cur[x - 1]
            cur = cur.reshape(stride)
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[i] = cur.reshape(w, 3)
        prev = cur
    return out


def jpeg_encode(arr: np.ndarray) -> bytes:  # pragma: no cover - stub
    """STUB: no libjpeg in this container. Plumbing is format-agnostic."""
    raise NotImplementedError("JPEG codec unavailable in sandbox; use fmt='png'")


def jpeg_decode(data: bytes) -> np.ndarray:  # pragma: no cover - stub
    raise NotImplementedError("JPEG codec unavailable in sandbox; use fmt='png'")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        return jpeg_decode(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def phash64(arr: np.ndarray) -> int:
    """64-bit average-hash: 8x8 block-mean luma thresholded at its mean.

    Signed int64 output (Spark/DuckDB BIGINT-safe). Blocking key for the
    near-duplicate join (SURVEY.md J7: the reference blocks structure
    matching by formula; we block images by phash band).
    """
    luma = arr.astype(np.float64).mean(axis=2)
    h, w = luma.shape
    if h % 8 == 0 and w % 8 == 0:
        # fast path: exact 8x8 blocking via reshape (identical means to the
        # general path when the dims divide evenly, which all generated
        # sizes do)
        grid = luma.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        ye = np.append(ys[1:], h)
        xe = np.append(xs[1:], w)
        grid = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                grid[i, j] = luma[ys[i] : ye[i], xs[j] : xe[j]].mean()
    bits = (grid > grid.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def make_image(url_canon: str) -> dict:
    """Deterministic image+caption record for a fetched URL.

    Smooth low-frequency content (upsampled 4x4 noise) so phash buckets are
    non-degenerate. Everything derives from md5(url) — no global RNG state.
    """
    hv = h60("img|" + url_canon)
    w = int(32 + 16 * (hv % 3))  # 32 / 48 / 64
    h = int(32 + 16 * ((hv >> 2) % 3))
    # hash-derived pseudo-random content (no Generator: per-row RNG init was
    # ~40% of fetch cost; uint64 mix arithmetic is vectorized and identical
    # across processes)
    hv64 = np.uint64(hv)
    bidx = np.arange(48, dtype=np.uint64)
    x = hv64 + (bidx + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)  # splitmix64
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    base = (x & np.uint64(0xFF)).astype(np.uint8).reshape(4, 4, 3)
    arr = np.repeat(np.repeat(base, h // 4, axis=0), w // 4, axis=1)[:h, :w]
    nidx = np.arange(h * w * 3, dtype=np.uint64)
    noise = (
        ((hv64 ^ (nidx * np.uint64(0x9E3779B97F4A7C15))) >> np.uint64(11)) & np.uint64(0xF)
    ).astype(np.uint8).reshape(h, w, 3)
    arr = (arr.astype(np.int16) + noise).clip(0, 255).astype(np.uint8)
    image_id = f"im_{hv % 10**10:010d}"  # analog of the reference's sd_ id,
    # /root/reference/findMissingPages.py:33
    caption = f"synthetic scene {hv % 9973} of {url_canon}"
    return {
        "image_id": image_id,
        "bytes": png_encode(arr),
        "w": w,
        "h": h,
        "fmt": "png",
        "caption": caption,
        "phash": phash64(arr),
    }


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
