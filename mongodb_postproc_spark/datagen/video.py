"""Video payloads: a real YUV4MPEG2 (Y4M) codec + deterministic synthesis.

The video leg of the multimodal battery. Bytes in the ``bytes`` column are
REAL Y4M streams — the mjpegtools YUV4MPEG2 format (public: plain-text
``YUV4MPEG2`` header with W/H/F/I/A/C tokens, then ``FRAME`` markers with raw
planes; we emit ``Cmono`` = one luma plane per frame) — so the decode step is
a genuine container parser, not a pickle. Synthesis is a pure function of the
URL (md5-seeded splitmix64, the make_images/make_audios discipline), so
records are independent of batch composition/partitioning and import-time
golden tables replay the exact executor code path.

A full deployment would swap y4m_decode for pyav/ffmpeg behind the same
mapInPandas signature; nothing else changes (the container ships no video
libs, per the environment contract).
"""

from __future__ import annotations

import numpy as np

from ..functions.hashes import h60

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


# ------------------------------------------------------------------- codec
def y4m_encode(frames: np.ndarray, fps: tuple[int, int]) -> bytes:
    """Encode (n_frames, h, w) uint8 luma as a YUV4MPEG2 Cmono stream."""
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode()
    body = b"".join(b"FRAME\n" + frames[i].tobytes() for i in range(n))
    return head + body


def y4m_decode(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Parse a YUV4MPEG2 Cmono stream -> ((n_frames, h, w) uint8, fps).

    Tokenizes the stream header properly (token order is free per the spec;
    unknown X-tokens are skipped) instead of assuming fixed offsets.
    """
    nl = data.index(b"\n")
    head = data[:nl].decode()
    parts = head.split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    colorspace = "420"
    for tok in parts[1:]:
        if not tok:
            continue
        key, val = tok[0], tok[1:]
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif key == "C":
            colorspace = val
    if w is None or h is None:
        raise ValueError("missing W/H header tokens")
    if colorspace != "mono":
        raise ValueError(f"unsupported colorspace C{colorspace}")
    frames = []
    pos = nl + 1
    fsize = w * h
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        frames.append(np.frombuffer(data[pos:pos + fsize], dtype=np.uint8).reshape(h, w))
        pos += fsize
    return np.stack(frames), fps


# ------------------------------------------------------------- fingerprints
def vhash64(frames: np.ndarray) -> int:
    """64-bit video hash: average-hash of the temporal-mean frame on an 8x8
    grid, EXACT integer arithmetic (pixel sums) so batch and scalar pipelines
    agree by construction. Signed int64 (Spark/DuckDB BIGINT-safe)."""
    n, h, w = frames.shape
    tot = frames.astype(np.int64).sum(axis=0)  # (h, w) exact temporal sums
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.zeros((8, 8), dtype=np.int64)
    areas = np.zeros((8, 8), dtype=np.int64)
    for i in range(8):
        for j in range(8):
            blk = tot[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            blocks[i, j] = blk.sum()
            areas[i, j] = blk.size
    # bit = block mean > grand mean, compared in exact cross-multiplied ints
    grand, total_area = blocks.sum(), areas.sum()
    bits = (blocks * total_area > grand * areas).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def cut_frame(frames: np.ndarray) -> int:
    """Scene-cut detector: 1 + argmax of inter-frame absolute-delta sum
    (exact integer; ties broken by first occurrence). Shared by the Spark
    stage and the golden generator."""
    deltas = np.abs(np.diff(frames.astype(np.int64), axis=0)).sum(axis=(1, 2))
    return int(deltas.argmax()) + 1


# --------------------------------------------------------------- synthesis
_DIMS = ((16, 16), (24, 16))
_NFRAMES = (12, 16, 20)
_FPS = ((25, 1), (30, 1))


def _pattern(hv: np.ndarray, n: int, h: int, w: int, phase_shift: int) -> np.ndarray:
    """(m, n, h, w) uint8 moving-gradient + noise pattern for hashes hv."""
    m = len(hv)
    hv = hv.reshape(m, 1, 1, 1)
    fidx = np.arange(n, dtype=np.int64).reshape(1, n, 1, 1)
    yy = np.arange(h, dtype=np.int64).reshape(1, 1, h, 1)
    xx = np.arange(w, dtype=np.int64).reshape(1, 1, 1, w)
    period = (8 + (hv >> np.uint64(7 + phase_shift)) % np.uint64(9)).astype(np.int64)
    dx = (1 + (hv >> np.uint64(13 + phase_shift)) % np.uint64(2)).astype(np.int64)
    # triangle wave (no %256 wrap discontinuity): per-pixel motion delta is
    # bounded by slope*dx = (255/period)*dx <= 64, far under the ~127/px
    # scene-cut inversion delta — cut detection is unambiguous by design
    phase = (xx + yy + fidx * dx) % (2 * period)
    base = np.abs(phase - period) * 255 // period
    cell = (hv + (fidx * np.int64(h * w) + yy * np.int64(w) + xx).astype(np.uint64)
            * _GOLDEN)
    noise = (_splitmix(cell) & np.uint64(0x1F)).astype(np.int64) - 16
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def make_videos(urls: list[str]) -> list[dict]:
    """Deterministic video records for a batch of URLs.

    Dimensions, frame count, fps, motion speed and the scene-cut position
    all derive from h60("vid|" + url). Each clip has exactly one hard scene
    cut (pattern A -> brighter phase-shifted pattern B) at a frame in
    [n/4, 3n/4), so cut detection is non-trivial but unambiguous. Rows
    sharing (w, h, n_frames) synthesize as one (m, n, h, w) numpy stack.
    """
    n_urls = len(urls)
    out: list[dict | None] = [None] * n_urls
    # same numpy-1.x discipline as datagen/audio.py: keep uint64 on both
    # sides of every scalar op (mixed scalar ops promote to float64)
    hvs = np.array([h60("vid|" + u) for u in urls], dtype=np.uint64)
    dims = [_DIMS[int(h % np.uint64(2))] for h in hvs]
    nfs = [_NFRAMES[int((h >> np.uint64(2)) % np.uint64(3))] for h in hvs]
    fpss = [_FPS[int((h >> np.uint64(5)) % np.uint64(2))] for h in hvs]
    for (w, h), nf in sorted({(d, n) for d, n in zip(dims, nfs)}):
        idx = [i for i in range(n_urls) if dims[i] == (w, h) and nfs[i] == nf]
        hv = hvs[idx]
        cuts = (nf // 4 + (hv >> np.uint64(20)) % np.uint64(nf // 2)).astype(np.int64)
        pat_a = _pattern(hv, nf, h, w, 0)
        # scene B = luma inversion of scene A (motion continues): the cut
        # delta (mean ~127/px, |255-2a|) always dominates the intra-scene
        # motion delta (<=64/px) — the detector is unambiguous by design
        pat_b = np.uint8(255) - pat_a
        fsel = np.arange(nf).reshape(1, nf, 1, 1) >= cuts.reshape(-1, 1, 1, 1)
        clips = np.where(fsel, pat_b, pat_a)
        for k, i in enumerate(idx):
            hvi = int(hvs[i])
            frames = clips[k]
            out[i] = {
                "video_id": f"vi_{hvi % 10**10:010d}",
                "bytes": y4m_encode(frames, fpss[i]),
                "w": w,
                "h": h,
                "n_frames": nf,
                "fps_num": fpss[i][0],
                "fps_den": fpss[i][1],
                "caption": f"synthetic clip {hvi % 9973} of {urls[i]}",
                "vhash": vhash64(frames),
                "cut": int(cuts[k]),
            }
    return out  # type: ignore[return-value]


def make_video(url_canon: str) -> dict:
    """Single-URL form of :func:`make_videos` (same code path, batch of 1)."""
    return make_videos([url_canon])[0]
