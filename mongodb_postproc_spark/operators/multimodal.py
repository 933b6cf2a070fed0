"""Multimodal (image) operators — binary payload columns + pandas-UDF stages.

The image analog of the reference's per-record scientific payload (CIF text
decoded per row, U1-U3 in SURVEY.md §2.8): opaque ``binary`` column + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages. The decode here
is the repo's own pure-numpy PNG codec (datagen/images.py) — real bytes, real
decode; swap the codec call for libjpeg/pillow on a full cluster (JPEG is an
explicit ``NotImplementedError`` stub).

No SQL oracle (binary image ops aren't SQL-expressible) → driver records the
rows-only check; the pixel-level correctness gate is
``crawl.engine.validate_images`` + tests/test_images.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..crawl.canonicalize import canonicalize_py
from ..datagen.images import decode_image, make_image, phash64
from ..datagen.web import SyntheticWeb, WebConfig
from .base import register

_N_SAMPLE = 48


def _sample_images_df(spark: SparkSession) -> DataFrame:
    """Deterministic image table (same generator the crawl lands)."""
    web = SyntheticWeb(WebConfig(seed="mm-v1"))
    urls = sorted({canonicalize_py(u) for u in web.seed_urls(_N_SAMPLE)} - {None})
    recs = [dict(make_image(u), url_canon=u) for u in urls]
    return spark.createDataFrame(
        pd.DataFrame(recs),
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, url_canon string",
    )


@register(
    "mm_decode_metadata",
    None,
    "Image decode → per-channel stats (binary column in, typed metadata "
    "out; Arrow-batched mapInPandas — the U1/U2 payload-decode analog)",
)
def mm_decode_metadata(spark: SparkSession, sf: str) -> DataFrame:
    imgs = _sample_images_df(spark)

    def decode_stats(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                px = decode_image(r["bytes"], r["fmt"])
                rows.append(
                    {
                        "image_id": r["image_id"],
                        "w": int(px.shape[1]),
                        "h": int(px.shape[0]),
                        "mean_r": round(float(px[:, :, 0].mean()), 4),
                        "mean_g": round(float(px[:, :, 1].mean()), 4),
                        "mean_b": round(float(px[:, :, 2].mean()), 4),
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["image_id", "w", "h", "mean_r", "mean_g", "mean_b"]
            )

    return imgs.mapInPandas(
        decode_stats,
        "image_id string, w int, h int, mean_r double, mean_g double, mean_b double",
    ).orderBy("image_id")


@register(
    "mm_resize_rehash",
    None,
    "Image resize (8x8 average-pool) + re-hash — the feature-extraction "
    "stage shape (decode → transform → typed struct out)",
)
def mm_resize_rehash(spark: SparkSession, sf: str) -> DataFrame:
    imgs = _sample_images_df(spark)

    def resize(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                px = decode_image(r["bytes"], r["fmt"]).astype(np.float64)
                h, w, _ = px.shape
                ys = (np.arange(9) * h) // 8
                xs = (np.arange(9) * w) // 8
                small = np.zeros((8, 8, 3))
                for i in range(8):
                    for j in range(8):
                        small[i, j] = px[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean(axis=(0, 1))
                small8 = small.clip(0, 255).astype(np.uint8)
                rows.append(
                    {
                        "image_id": r["image_id"],
                        "phash_full": int(r["phash"]),
                        "phash_small": phash64(small8),
                        "thumb_mean": round(float(small8.mean()), 4),
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["image_id", "phash_full", "phash_small", "thumb_mean"]
            )

    return imgs.mapInPandas(
        resize, "image_id string, phash_full long, phash_small long, thumb_mean double"
    ).orderBy("image_id")


@register(
    "mm_phash_near_dup_bands",
    None,
    "Near-dup candidate pairs by 16-bit phash band equality (the J7 "
    "blocked similarity join on image payloads)",
)
def mm_phash_bands(spark: SparkSession, sf: str) -> DataFrame:
    imgs = _sample_images_df(spark)
    imgs.createOrReplaceTempView("v_mm_images")
    return spark.sql("""
        WITH bands AS (
          SELECT image_id, b AS band,
                 (phash >> (b * 16)) & 65535 AS band_val
          FROM v_mm_images LATERAL VIEW explode(sequence(0, 3)) AS b)
        SELECT a.image_id AS img_a, b.image_id AS img_b,
               count(DISTINCT a.band) AS n_band_hits
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_val = b.band_val
         AND a.image_id < b.image_id
        GROUP BY a.image_id, b.image_id
        ORDER BY img_a, img_b
    """)
