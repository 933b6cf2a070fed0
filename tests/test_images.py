import numpy as np
import pytest

from mongodb_postproc_spark.datagen.images import (
    decode_image,
    jpeg_decode,
    make_image,
    phash64,
    png_decode,
    png_encode,
    psnr,
)


def test_png_roundtrip():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    assert (png_decode(png_encode(arr)) == arr).all()


def test_make_image_deterministic():
    a = make_image("http://host1.test/p/5")
    b = make_image("http://host1.test/p/5")
    assert a["bytes"] == b["bytes"]
    assert a["phash"] == b["phash"]
    assert a["caption"] == b["caption"]
    c = make_image("http://host1.test/p/6")
    assert c["bytes"] != a["bytes"]


def test_decoded_pixels_and_psnr():
    rec = make_image("http://host2.test/p/9")
    px = decode_image(rec["bytes"], rec["fmt"])
    assert px.shape == (rec["h"], rec["w"], 3)
    assert psnr(px, px) == float("inf")
    noisy = px.astype(np.int16).copy()
    noisy[0, 0, 0] += 3
    assert 40.0 < psnr(px, noisy.clip(0, 255).astype(np.uint8)) < 100.0
    assert rec["phash"] == phash64(px)


def test_phash_locality():
    rec = make_image("http://host2.test/p/9")
    px = decode_image(rec["bytes"], rec["fmt"])
    slight = (px.astype(np.int16) + 1).clip(0, 255).astype(np.uint8)
    d = bin(phash64(px) ^ phash64(slight)).count("1")
    assert d <= 8  # near-dup stays in nearby phash space


def test_jpeg_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        jpeg_decode(b"\xff\xd8fake")


def test_batch_invariance():
    """Payload records are pure functions of the URL: identical regardless
    of batch composition/order (what makes the fetch stage deterministic
    under any partitioning)."""
    from mongodb_postproc_spark.datagen.images import make_images

    urls = [f"http://host{i % 7}.test/p/{i}" for i in range(60)]
    batch = make_images(urls)
    singles = [make_images([u])[0] for u in urls]
    shuffled = make_images(urls[::-1])[::-1]
    for b, s, sh in zip(batch, singles, shuffled):
        assert b == s == sh
