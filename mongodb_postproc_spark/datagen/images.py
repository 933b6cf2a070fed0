"""Deterministic image payload generation + pure-numpy PNG codec + phash.

The crawl's landing table is ``images(image_id, bytes, w, h, fmt, caption,
phash)`` per BASELINE.json input_hint. The sandbox has no PIL/libjpeg, so:

- PNG is REAL: encoded/decoded here with zlib + numpy (8-bit RGB, filter 0
  on encode; filters 0-2 supported on decode). The per-row invariant
  "decoded-pixel allclose" (the analog of the reference's tolerance
  equality, /root/reference/compositionMatcher.py:60) runs on actual bytes.
- JPEG is the real ALGORITHM in pure numpy — RGB→YCbCr, 8x8 block DCT-II,
  Annex-K quality-scaled quantization, zigzag — with zlib standing in for
  the Huffman entropy stage and a private container instead of JFIF (no
  libjpeg in the sandbox to interop with). Rate-distortion behavior is
  real: decode != raw, and the PSNR>=40dB lossy invariant bites.

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


# ---------------------------------------------------------------------------
# Lossy codec: the JPEG algorithm (RGB→YCbCr, 8x8 block DCT-II, quality-
# scaled quantization with the standard Annex-K tables, zigzag scan) in pure
# numpy. The entropy stage is zlib over the zigzagged int16 coefficients
# instead of Huffman/arithmetic coding, and the container is a private
# header rather than JFIF — the sandbox has no libjpeg to interop with, so
# the *rate-distortion behavior* (what the PSNR≥40dB invariant exercises)
# is real while the bitstream framing is simplified. Deterministic: pure
# float64/int arithmetic, no RNG.
# ---------------------------------------------------------------------------

_JPEG_MAGIC = b"NJPG"
_JPEG_QUALITY = 96  # min PSNR 40.8dB on the synthetic corpus (invariant: >=40)

# ITU-T.81 Annex K base quantization tables
_QY = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_QC = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)


def _qtables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    qy = np.floor((_QY * s + 50) / 100).clip(1, 255)
    qc = np.floor((_QC * s + 50) / 100).clip(1, 255)
    return qy, qc


_DCT = np.array(
    [
        [
            (np.sqrt(0.125) if k == 0 else 0.5) * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

_ZIG = np.array(sorted(range(64), key=lambda i: (
    (i // 8 + i % 8), (i % 8 if (i // 8 + i % 8) % 2 else i // 8))))


def _to_blocks(ch: np.ndarray) -> np.ndarray:
    h, w = ch.shape
    return ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


_YCBCR = np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312],
])


def jpeg_encode_batch(stack: np.ndarray, quality: int = _JPEG_QUALITY) -> list[bytes]:
    """Vectorized JPEG-algorithm encode of an (n, h, w, 3) uint8 stack with
    8-divisible dims: one batched 8x8 matmul pair per channel for the WHOLE
    stack (measured ~14x faster than the einsum formulation); only the
    per-row zlib entropy stage runs row-wise (the fetch-stage shape)."""
    n, h, w, _ = stack.shape
    r, g, b = (stack[..., c].astype(np.float64) for c in range(3))
    ycc = np.empty((n, h, w, 3))
    ycc[..., 0] = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    ycc[..., 1] = -0.168736 * r - 0.331264 * g + 0.5 * b
    ycc[..., 2] = 0.5 * r - 0.418688 * g - 0.081312 * b
    qy, qc = _qtables(quality)
    per_img = []
    for c in range(3):
        blocks = (
            ycc[..., c]
            .reshape(n, h // 8, 8, w // 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(-1, 8, 8)
        )
        f = _DCT @ blocks @ _DCT.T
        q = qy if c == 0 else qc
        per_img.append(np.round(f / q).astype(np.int16).reshape(n, -1, 64)[:, :, _ZIG])
    header = _JPEG_MAGIC + struct.pack(">HHB", w, h, quality)
    return [
        header
        + zlib.compress(
            np.concatenate([per_img[c][i].ravel() for c in range(3)]).tobytes(), 1
        )
        for i in range(n)
    ]


def jpeg_encode(arr: np.ndarray, quality: int = _JPEG_QUALITY) -> bytes:
    """JPEG-algorithm lossy encode of an (h, w, 3) uint8 array (see module
    note: real DCT/quantization pipeline, simplified container)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = arr.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="edge")
    body = jpeg_encode_batch(padded[None, ...], quality)[0][9:]
    # header carries the true (unpadded) dims; decode re-pads and crops
    return _JPEG_MAGIC + struct.pack(">HHB", w, h, quality) + body


def jpeg_decode(data: bytes) -> np.ndarray:
    if data[:4] != _JPEG_MAGIC:
        raise ValueError("not an NJPG payload")
    w, h, quality = struct.unpack(">HHB", data[4:9])
    ph, pw = -h % 8, -w % 8
    hh, ww = h + ph, w + pw
    nb = (hh // 8) * (ww // 8)
    flat = np.frombuffer(zlib.decompress(data[9:]), dtype=np.int16)
    qy, qc = _qtables(quality)
    inv_zig = np.argsort(_ZIG)
    chans = []
    per = nb * 64
    for c in range(3):
        zz = flat[c * per:(c + 1) * per].reshape(nb, 64)[:, inv_zig].reshape(nb, 8, 8)
        q = qy if c == 0 else qc
        f = zz.astype(np.float64) * q
        blocks = _DCT.T @ f @ _DCT
        chans.append(_from_blocks(blocks, hh, ww))
    ycc = np.stack(chans, axis=-1)
    ycc[..., 0] += 128.0
    rgb = ycc @ np.linalg.inv(_YCBCR).T
    return rgb[:h, :w].round().clip(0, 255).astype(np.uint8)


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


def make_images(urls: list[str], return_raw: bool = False) -> list[dict]:
    """Deterministic image+caption records for a batch of URLs — the fetch
    stage's payload generator, vectorized across the batch.

    Each record is a pure function of its URL (md5-seeded splitmix64
    content, no RNG state), so the output is independent of batch
    composition, ordering, and partitioning — asserted by
    tests/test_images.py::test_batch_invariance. Rows are grouped by
    (w, h) and synthesized as numpy stacks. 1 in 8 rows encodes lossy
    (fmt='jpeg', batch-vectorized DCT) per the input_hint's mixed-format
    contract; the rest are lossless PNG. ``return_raw=True`` adds the
    pre-codec pixel array under 'raw' (the validate_images reference —
    for lossy rows decode != raw, which is what makes the PSNR>=40dB
    invariant non-vacuous); phash is always computed on the raw array.
    """
    n = len(urls)
    out: list[dict | None] = [None] * n
    hvs = np.array([h60("img|" + u) for u in urls], dtype=np.uint64)
    ws = (32 + 16 * (hvs % np.uint64(3))).astype(np.int64)
    hs = (32 + 16 * ((hvs >> np.uint64(2)) % np.uint64(3))).astype(np.int64)
    jpeg_mask = (hvs % np.uint64(8)) == np.uint64(3)
    bidx = (np.arange(48, dtype=np.uint64) + np.uint64(1)) * _GOLDEN
    for w, h in sorted({(int(a), int(b)) for a, b in zip(ws, hs)}):
        (idx,) = np.nonzero((ws == w) & (hs == h))
        nidx = np.arange(h * w * 3, dtype=np.uint64) * _GOLDEN
        for lo in range(0, len(idx), _CHUNK):
            chunk = idx[lo : lo + _CHUNK]
            hv = hvs[chunk][:, None]
            # base tiles in 0..239 so adding 4-bit noise stays in uint8 —
            # no int16 widening, no clip, no extra (m,h,w,3) temporaries.
            # NOTE the noise keeps the mild bit-11..14 structure of
            # consecutive golden-ratio multiples on purpose: a stronger mix
            # (tried) makes the subpixels zlib-incompressible and triples
            # both PNG size and deflate time.
            base = ((_splitmix(hv + bidx) & np.uint64(0xFF)) * np.uint64(240) >> np.uint64(8))
            base = base.astype(np.uint8).reshape(-1, 4, 4, 3)
            arr = np.repeat(np.repeat(base, h // 4, axis=1), w // 4, axis=2)
            noise = (((hv ^ nidx) >> np.uint64(11)) & np.uint64(0xF)).astype(np.uint8).reshape(
                -1, h, w, 3
            )
            arr += noise  # in-place: max 239 + 15 = 254
            hashes = _phash64_batch(arr)
            blobs: list[bytes | None] = [None] * len(chunk)
            (jk,) = np.nonzero(jpeg_mask[chunk])
            if len(jk):
                jbytes = jpeg_encode_batch(arr[jk])
                for t, k in enumerate(jk):
                    blobs[k] = jbytes[t]
            for k in np.nonzero(~jpeg_mask[chunk])[0]:
                blobs[k] = png_encode(arr[k])
            for k, i in enumerate(chunk):
                hvi = int(hvs[i])
                out[i] = {
                    "image_id": f"im_{hvi % 10**10:010d}",  # analog of the
                    # reference's sd_ id, /root/reference/findMissingPages.py:33
                    "bytes": blobs[k],
                    "w": w,
                    "h": h,
                    "fmt": "jpeg" if jpeg_mask[i] else "png",
                    "caption": f"synthetic scene {hvi % 9973} of {urls[i]}",
                    "phash": hashes[k],
                }
                if return_raw:
                    out[i]["raw"] = arr[k]
    return out  # type: ignore[return-value]


def make_image(url_canon: str, return_raw: bool = False) -> dict:
    """Single-URL form of :func:`make_images` (same code path, batch of 1)."""
    return make_images([url_canon], return_raw=return_raw)[0]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
