"""Video codec + datagen unit tests (the Y4M analog of test_images.py /
test_audio.py): real container parsing, URL-pure synthesis, exact-integer
fingerprints, and by-construction-unambiguous scene cuts.
"""

import numpy as np

from mongodb_postproc_spark.datagen.video import (
    cut_frame,
    make_video,
    make_videos,
    vhash64,
    y4m_decode,
    y4m_encode,
)


def test_y4m_roundtrip():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(7, 12, 20), dtype=np.uint8)
    dec, fps = y4m_decode(y4m_encode(frames, (30, 1)))
    assert fps == (30, 1)
    assert (dec == frames).all()


def test_y4m_header_token_order_free():
    """The spec allows any token order and unknown X-tokens — the parser
    must tokenize, not assume fixed offsets."""
    frames = np.zeros((2, 4, 4), dtype=np.uint8)
    blob = y4m_encode(frames, (25, 1))
    body = blob[blob.index(b"\n") + 1:]
    reordered = b"YUV4MPEG2 Cmono F25:1 Xweird H4 W4\n" + body
    dec, fps = y4m_decode(reordered)
    assert dec.shape == (2, 4, 4) and fps == (25, 1)


def test_make_video_deterministic_and_batch_invariant():
    a = make_video("http://vid1.test/v/5")
    b = make_video("http://vid1.test/v/5")
    assert a["bytes"] == b["bytes"] and a["vhash"] == b["vhash"]
    batch = make_videos(
        ["http://vid0.test/v/9", "http://vid1.test/v/5", "http://x.test/z"]
    )
    assert batch[1]["bytes"] == a["bytes"]
    assert make_video("http://vid1.test/v/6")["bytes"] != a["bytes"]


def test_landed_columns_match_decode_recompute():
    recs = make_videos([f"http://vid{d % 7}.test/v/{d}" for d in range(40)])
    shapes = set()
    for r in recs:
        frames, fps = y4m_decode(r["bytes"])
        assert frames.shape == (r["n_frames"], r["h"], r["w"])
        assert fps == (r["fps_num"], r["fps_den"])
        assert vhash64(frames) == r["vhash"]
        # the scene cut is detectable exactly (inversion delta dominates
        # the bounded triangle-wave motion delta by construction)
        assert cut_frame(frames) == r["cut"]
        assert -(1 << 63) <= r["vhash"] < (1 << 63)
        shapes.add(frames.shape)
    assert len(shapes) > 2  # mixed clip shapes exercised
