"""Audio codec + datagen unit tests (the audio analog of test_images.py).

The WAV codec must be a real RIFF parser (chunk walking, word alignment),
synthesis must be a pure function of the URL independent of batch
composition, and the fingerprint must be deterministic pure-numpy.
"""

import struct

import numpy as np

from mongodb_postproc_spark.datagen.audio import (
    afp64,
    make_audio,
    make_audios,
    wav_decode,
    wav_encode,
)


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(11)
    for ch in (1, 2):
        pcm = rng.integers(-32768, 32767, size=(800, ch)).astype(np.int16)
        dec, sr = wav_decode(wav_encode(pcm, 16000))
        assert sr == 16000
        assert dec.shape == (800, ch)
        assert (dec == pcm).all()


def test_wav_decode_walks_extra_chunks():
    """A LIST chunk between fmt and data (common in the wild) must be
    skipped by the chunk walk, and odd-sized chunks must stay word-aligned."""
    pcm = np.arange(-300, 300, dtype=np.int16)[:, None]
    blob = wav_encode(pcm, 8000)
    # splice an odd-length junk chunk right after 'fmt '
    fmt_end = blob.index(b"data")
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded to even
    spliced = blob[:fmt_end] + junk + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    dec, sr = wav_decode(spliced)
    assert sr == 8000 and (dec == pcm).all()


def test_make_audio_deterministic_and_batch_invariant():
    a = make_audio("http://aud1.test/clip/5")
    b = make_audio("http://aud1.test/clip/5")
    assert a["bytes"] == b["bytes"] and a["afp"] == b["afp"]
    # batch composition must not change any record (executor-partitioning
    # independence — the same invariant make_images holds)
    batch = make_audios(
        ["http://aud0.test/clip/9", "http://aud1.test/clip/5", "http://x.test/z"]
    )
    assert batch[1]["bytes"] == a["bytes"]
    assert batch[1]["transcript"] == a["transcript"]
    c = make_audio("http://aud1.test/clip/6")
    assert c["bytes"] != a["bytes"]


def test_landed_fingerprint_matches_decode_recompute():
    recs = make_audios([f"http://aud{d % 9}.test/clip/{d}" for d in range(24)])
    srs = set()
    for r in recs:
        pcm, sr = wav_decode(r["bytes"])
        assert pcm.shape == (r["n_samples"], r["channels"])
        assert sr == r["sr"]
        assert afp64(pcm, sr) == r["afp"]
        assert -(1 << 63) <= r["afp"] < (1 << 63)
        srs.add((sr, r["channels"]))
    assert len(srs) > 1  # the battery exercises mixed shapes
