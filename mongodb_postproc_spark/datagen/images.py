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


_BIT_WEIGHTS = (1 << np.arange(63, -1, -1, dtype=np.uint64)).reshape(8, 8)


def _bits_to_i64(bits: np.ndarray) -> int:
    val = int((bits.astype(np.uint64) * _BIT_WEIGHTS).sum(dtype=np.uint64))
    return val - (1 << 64) if val >= (1 << 63) else val


def phash64(arr: np.ndarray) -> int:
    """64-bit average-hash: 8x8 block-mean luma thresholded at the grand
    mean, computed in EXACT integer arithmetic (block pixel sums) so the
    result is independent of summation order — batch and scalar pipelines
    produce identical hashes by construction.

    Signed int64 output (Spark/DuckDB BIGINT-safe). Blocking key for the
    near-duplicate join (SURVEY.md J7: the reference blocks structure
    matching by formula; we block images by phash band).
    """
    h, w = arr.shape[:2]
    s = arr.astype(np.int64).sum(axis=2)  # integer 3x-luma, exact
    if h % 8 == 0 and w % 8 == 0:
        block = s.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
        # block_mean > grand_mean  <=>  64*S_ij > sum(S)  (equal block sizes)
        bits = (64 * block) > block.sum()
    else:
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        ye = np.append(ys[1:], h)
        xe = np.append(xs[1:], w)
        block = np.empty((8, 8), dtype=np.int64)
        cnt = np.empty((8, 8), dtype=np.int64)
        for i in range(8):
            for j in range(8):
                blk = s[ys[i] : ye[i], xs[j] : xe[j]]
                block[i, j] = blk.sum()
                cnt[i, j] = blk.size
        # S_ij/c_ij > sumS/sumC  <=>  S_ij*sumC > sumS*c_ij (ints, no overflow)
        bits = block * cnt.sum() > block.sum() * cnt
    return _bits_to_i64(bits)


def _phash64_batch(stack: np.ndarray) -> list[int]:
    """Vectorized phash over an (n, h, w, 3) stack with 8-divisible dims;
    integer-exact, so identical to per-row :func:`phash64`."""
    n, h, w, _ = stack.shape
    s = stack.astype(np.int64).sum(axis=3)
    block = s.reshape(n, 8, h // 8, 8, w // 8).sum(axis=(2, 4))
    bits = (64 * block) > block.sum(axis=(1, 2), keepdims=True)
    vals = (bits.reshape(n, 64).astype(np.uint64) * _BIT_WEIGHTS.reshape(64)).sum(
        axis=1, dtype=np.uint64
    )
    return [int(v) - (1 << 64) if v >= (1 << 63) else int(v) for v in vals]


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_CHUNK = 128  # keeps the uint64 noise temporaries cache-resident (measured
# fastest: 386us/url at 128 vs 1141 at 1024 — the (m, h*w*3) uint64 noise
# matrix churns allocator + cache above ~25 MB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def make_images(urls: list[str]) -> list[dict]:
    """Deterministic image+caption records for a batch of URLs — the fetch
    stage's payload generator, vectorized across the batch.

    Each record is a pure function of its URL (md5-seeded splitmix64
    content, no RNG state), so the output is independent of batch
    composition, ordering, and partitioning — asserted by
    tests/test_images.py::test_batch_invariance. Rows are grouped by
    (w, h) and synthesized as numpy stacks; only the PNG deflate runs
    per row.
    """
    n = len(urls)
    out: list[dict | None] = [None] * n
    hvs = np.array([h60("img|" + u) for u in urls], dtype=np.uint64)
    ws = (32 + 16 * (hvs % np.uint64(3))).astype(np.int64)
    hs = (32 + 16 * ((hvs >> np.uint64(2)) % np.uint64(3))).astype(np.int64)
    bidx = (np.arange(48, dtype=np.uint64) + np.uint64(1)) * _GOLDEN
    for w, h in sorted({(int(a), int(b)) for a, b in zip(ws, hs)}):
        (idx,) = np.nonzero((ws == w) & (hs == h))
        nidx = np.arange(h * w * 3, dtype=np.uint64) * _GOLDEN
        for lo in range(0, len(idx), _CHUNK):
            chunk = idx[lo : lo + _CHUNK]
            hv = hvs[chunk][:, None]
            base = (_splitmix(hv + bidx) & np.uint64(0xFF)).astype(np.uint8).reshape(-1, 4, 4, 3)
            arr = np.repeat(np.repeat(base, h // 4, axis=1), w // 4, axis=2)
            noise = (((hv ^ nidx) >> np.uint64(11)) & np.uint64(0xF)).astype(np.uint8).reshape(
                -1, h, w, 3
            )
            arr = (arr.astype(np.int16) + noise).clip(0, 255).astype(np.uint8)
            hashes = _phash64_batch(arr)
            for k, i in enumerate(chunk):
                hvi = int(hvs[i])
                out[i] = {
                    "image_id": f"im_{hvi % 10**10:010d}",  # analog of the
                    # reference's sd_ id, /root/reference/findMissingPages.py:33
                    "bytes": png_encode(arr[k]),
                    "w": w,
                    "h": h,
                    "fmt": "png",
                    "caption": f"synthetic scene {hvi % 9973} of {urls[i]}",
                    "phash": hashes[k],
                }
    return out  # type: ignore[return-value]


def make_image(url_canon: str) -> dict:
    """Single-URL form of :func:`make_images` (same code path, batch of 1)."""
    return make_images([url_canon])[0]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
