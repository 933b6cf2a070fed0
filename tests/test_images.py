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


def test_jpeg_roundtrip_psnr():
    """The lossy codec is real: decode != raw, but PSNR >= 40dB and the
    round-trip is deterministic (identical bytes on re-encode)."""
    from mongodb_postproc_spark.datagen.images import jpeg_encode

    from mongodb_postproc_spark.datagen.images import make_images

    # corpus-shaped input (the >=40dB invariant is defined over the crawl
    # corpus; full-range white noise is JPEG's worst case and lands ~38dB)
    arr = make_images(["http://rt.test/a"], return_raw=True)[0]["raw"]
    data = jpeg_encode(arr)
    out = jpeg_decode(data)
    assert out.shape == arr.shape
    assert not (out == arr).all()          # genuinely lossy
    assert psnr(arr, out) >= 40.0          # the input_hint invariant
    assert jpeg_encode(arr) == data        # deterministic


def test_jpeg_nonmultiple_dims():
    from mongodb_postproc_spark.datagen.images import jpeg_encode

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(arr))
    assert out.shape == arr.shape and psnr(arr, out) >= 30.0


def test_mixed_format_generation():
    """1 in 8 synthetic rows is lossy; every row's stored bytes decode to
    its raw array exactly (png) or within the PSNR bound (jpeg)."""
    from mongodb_postproc_spark.datagen.images import make_images

    recs = make_images([f"http://mixed{i}.test/x/{i}" for i in range(64)],
                       return_raw=True)
    fmts = {r["fmt"] for r in recs}
    assert fmts == {"png", "jpeg"}
    for r in recs:
        got = decode_image(r["bytes"], r["fmt"])
        if r["fmt"] == "png":
            assert (got == r["raw"]).all()
        else:
            assert psnr(r["raw"], got) >= 40.0


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


def test_validate_images_flags_tampered_rows(spark):
    """The invariant checker is non-vacuous in BOTH directions: pristine
    rows pass, and each kind of tamper (payload bytes, caption, phash,
    format relabel) is flagged — covering the vectorized per-(h,w)-stack
    compare paths of validate_images."""
    import pandas as pd

    from mongodb_postproc_spark.crawl.engine import validate_images
    from mongodb_postproc_spark.datagen.images import make_images

    urls = [f"http://host{i % 3}.test/p/{i}" for i in range(24)]
    recs = make_images(urls)
    rows = [
        {"url_canon": u, "seq": i, **r} for i, (u, r) in enumerate(zip(urls, recs))
    ]
    # tamper four rows, one invariant each
    rows[1]["bytes"] = make_images(["http://other.test/p/999"])[0]["bytes"]
    rows[2]["caption"] = "tampered caption"
    rows[3]["phash"] = rows[3]["phash"] ^ 0xFF
    rows[5]["fmt"] = "jpeg" if rows[5]["fmt"] == "png" else "png"
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "url_canon string, seq long, image_id string, bytes binary, w int, "
        "h int, fmt string, caption string, phash long",
    )
    bad = {r["url_canon"] for r in validate_images(df).collect()}
    assert bad == {urls[1], urls[2], urls[3], urls[5]}, bad
