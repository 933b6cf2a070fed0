"""Audio payloads: a real RIFF/WAVE PCM-16 codec + deterministic synthesis.

The audio leg of the multimodal battery (SURVEY.md §2.8 U1-U5 are exercised
over image payloads; the prompt's training-data pipeline asks for the same
plumbing over audio/video). Bytes in the ``bytes`` column are REAL WAV files
— canonical RIFF container, 16-bit little-endian PCM (the format is public:
Microsoft/IBM RIFF spec, 1991) — so the decode step is a genuine parser, not
a pickle. Synthesis is a pure function of the URL (md5-seeded splitmix64,
same discipline as datagen/images.py make_images), so records are
independent of batch composition/partitioning, and import-time golden tables
can be computed by the exact same code path the executors run.

A full deployment would swap wav_decode for soundfile/ffmpeg behind the same
mapInPandas signature; nothing else changes (the container ships no audio
libs, per the environment contract).
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashes import h60

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


# ------------------------------------------------------------------- codec
def wav_encode(pcm: np.ndarray, sr: int) -> bytes:
    """Encode (n_samples, channels) int16 PCM as a canonical RIFF/WAVE blob."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    data = pcm.astype("<i2").tobytes()  # interleaved little-endian
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE blob -> ((n_samples, channels) int16, sample_rate).

    Walks the chunk list properly (fmt may be followed by LIST/fact chunks
    in the wild) instead of assuming fixed offsets.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    ch = sr = None
    pcm = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, ch, sr = struct.unpack("<HHI", payload[:8])
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAVE format {audio_fmt}")
        elif tag == b"data":
            pcm = np.frombuffer(payload, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if pcm is None or ch is None:
        raise ValueError("missing fmt/data chunk")
    return pcm.reshape(-1, ch), int(sr)


# ------------------------------------------------------------- fingerprint
N_FP_FRAMES = 17  # 16 energy deltas per band
N_FP_BANDS = 4


def afp64(pcm: np.ndarray, sr: int) -> int:
    """64-bit audio fingerprint: sign of energy deltas on a 16-frame x
    4-band grid (the shape of Haitsma-Kalker / Shazam-style landmark
    hashes, reduced to one word). Mono mix -> 17 equal frames -> rFFT per
    frame -> 4 equal spectral bands -> bit[f*4+b] = E[f+1,b] > E[f,b].
    Deterministic given identical input (pure numpy, no RNG)."""
    mono = pcm.astype(np.float64).mean(axis=1)
    n = len(mono) - (len(mono) % N_FP_FRAMES)
    frames = mono[:n].reshape(N_FP_FRAMES, -1)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    nb = spec.shape[1] - (spec.shape[1] % N_FP_BANDS)
    bands = spec[:, :nb].reshape(N_FP_FRAMES, N_FP_BANDS, -1).sum(axis=2)
    bits = (bands[1:] > bands[:-1]).astype(np.uint64).reshape(-1)  # 64 bits
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    iv = int(val)
    return iv - (1 << 64) if iv >= (1 << 63) else iv


# --------------------------------------------------------------- synthesis
_SRS = (8000, 16000)
_DUR_MS = (80, 120, 160)


def make_audios(urls: list[str]) -> list[dict]:
    """Deterministic audio records for a batch of URLs.

    Each record is a pure function of its URL: sample rate, duration,
    channel count, two sine partials and a 9-bit noise floor all derive
    from h60("aud|" + url). Rows sharing (sr, n_samples, channels) are
    synthesized as one numpy stack (batch-vectorized, mirroring
    make_images); only the WAV serialization is per-row (it is a memcpy).
    """
    n = len(urls)
    out: list[dict | None] = [None] * n
    # NOTE: scalar np.uint64 <op> python-int promotes to float64 in numpy 1.x
    # and silently drops low bits — every mixed op below keeps uint64 on both
    # sides (array ops with int scalars are safe; bare-scalar ops are not).
    hvs = np.array([h60("aud|" + u) for u in urls], dtype=np.uint64)
    srs = np.array([_SRS[int(h % np.uint64(2))] for h in hvs], dtype=np.int64)
    durs = np.array(
        [_DUR_MS[int((h >> np.uint64(2)) % np.uint64(3))] for h in hvs], dtype=np.int64
    )
    chs = np.where((hvs >> np.uint64(4)) % np.uint64(4) == 0, 2, 1).astype(np.int64)
    f0s = (200 + (hvs >> np.uint64(6)) % np.uint64(1800)).astype(np.float64)
    f1s = (300 + (hvs >> np.uint64(16)) % np.uint64(3000)).astype(np.float64)
    for sr, dur, ch in sorted({(int(a), int(b), int(c)) for a, b, c in zip(srs, durs, chs)}):
        (idx,) = np.nonzero((srs == sr) & (durs == dur) & (chs == ch))
        ns = sr * dur // 1000
        t = np.arange(ns, dtype=np.float64) / sr  # (ns,)
        hv = hvs[idx][:, None]  # (m, 1)
        sig = 9000.0 * np.sin(2 * np.pi * f0s[idx][:, None] * t) + 4000.0 * np.sin(
            2 * np.pi * f1s[idx][:, None] * t
        )
        nidx = np.arange(ns, dtype=np.uint64) * _GOLDEN
        noise = (_splitmix(hv + nidx) & np.uint64(0x1FF)).astype(np.float64) - 256.0
        mono = np.clip(sig + noise, -32768, 32767).astype(np.int16)  # (m, ns)
        if ch == 2:
            noise_r = (_splitmix((hv ^ _GOLDEN) + nidx) & np.uint64(0x1FF)).astype(
                np.float64
            ) - 256.0
            right = np.clip(sig * 0.75 + noise_r, -32768, 32767).astype(np.int16)
            stacks = np.stack([mono, right], axis=2)  # (m, ns, 2)
        else:
            stacks = mono[:, :, None]  # (m, ns, 1)
        for k, i in enumerate(idx):
            hvi = int(hvs[i])
            pcm = stacks[k]
            out[i] = {
                "audio_id": f"au_{hvi % 10**10:010d}",
                "bytes": wav_encode(pcm, sr),
                "sr": sr,
                "n_samples": ns,
                "channels": ch,
                "transcript": f"synthetic utterance {hvi % 9973} of {urls[i]}",
                "afp": afp64(pcm, sr),
            }
    return out  # type: ignore[return-value]


def make_audio(url_canon: str) -> dict:
    """Single-URL form of :func:`make_audios` (same code path, batch of 1)."""
    return make_audios([url_canon])[0]
