"""Multimodal video operators — binary Y4M payload columns + pandas-UDF stages.

Third modality of the multimodal battery (images: operators/multimodal.py,
audio: operators/audioops.py — same plumbing contract: opaque ``binary``
column + typed metadata, Arrow-batched ``mapInPandas``, per-shape vectorized
stats, golden-value oracles). The codec is a real YUV4MPEG2 container parser
(datagen/video.py); the frame-sample / scene-cut stage is the video-specific
kernel a training-data pipeline needs (keyframe extraction, shot detection).

Input: a video landing-table analog GENERATED ON THE EXECUTORS from the
sf-scaled ``documents`` table (one clip per doc_id < VID_MAX_DOC).

Oracles: golden expected-value tables computed AT IMPORT TIME by the pure
numpy codec path (no Spark) and rendered as VALUES literals joined against
``documents`` — DuckDB checks values, not just row counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen.video import cut_frame, make_videos, vhash64, y4m_decode
from .base import load, register

VID_MAX_DOC = 100
FRAME_STRIDE = 4  # keyframe sampling stride

VID_SCHEMA = (
    "doc_id long, url_canon string, video_id string, bytes binary, w int, "
    "h int, n_frames int, fps_num int, fps_den int, caption string, "
    "vhash long, cut int"
)
_VID_COLS = [c.split()[0] for c in VID_SCHEMA.split(", ")]


def _vid_urls(doc_ids: list[int]) -> list[str]:
    return [f"http://vid{d % 7}.test/v/{d}" for d in doc_ids]


def _videos_df(spark: SparkSession, sf: str) -> DataFrame:
    """The video+caption landing table for this sf: one deterministic Y4M
    clip per stored doc_id, synthesized executor-side in Arrow batches
    (datagen/video.py make_videos, batch-stacked per (w, h, n_frames))."""
    docs = (
        load(spark, sf, "documents").select("doc_id").filter(F.col("doc_id") < VID_MAX_DOC)
    )

    def gen(batches):
        for pdf in batches:
            ids = [int(x) for x in pdf["doc_id"]]
            if not ids:
                yield pd.DataFrame(columns=_VID_COLS)
                continue
            urls = _vid_urls(ids)
            recs = make_videos(urls)
            yield pd.DataFrame(
                [{"doc_id": d, "url_canon": u, **r} for d, u, r in zip(ids, urls, recs)]
            )

    return docs.mapInPandas(gen, VID_SCHEMA)


def _round4(x: float) -> float:
    """Spark/DuckDB ROUND HALF_UP semantics at 4dp for positive values."""
    import math

    return math.floor(x * 10_000 + 0.5) / 10_000


# ------------------------------------------------------------------ goldens
def _golden() -> list[dict]:
    """Expected per-clip values for every possible doc_id, computed by the
    pure numpy codec path (no Spark)."""
    ids = list(range(VID_MAX_DOC))
    recs = make_videos(_vid_urls(ids))
    rows = []
    for d, rec in zip(ids, recs):
        frames, fps = y4m_decode(rec["bytes"])
        sampled = frames[::FRAME_STRIDE]
        rows.append(
            {
                "doc_id": d,
                "video_id": rec["video_id"],
                "w": int(frames.shape[2]),
                "h": int(frames.shape[1]),
                "n_frames": int(frames.shape[0]),
                "fps_num": fps[0],
                "fps_den": fps[1],
                "mean_luma": _round4(float(frames.astype(np.float64).mean())),
                "caption": rec["caption"],
                "cut_detected": cut_frame(frames),
                "vhash_re": vhash64(frames),
                "n_sampled": int(sampled.shape[0]),
                "sample_mean": _round4(float(sampled.astype(np.float64).mean())),
            }
        )
    return rows


_G = _golden()


def _values_table(cols: list[str]) -> str:
    def lit(v):
        if isinstance(v, str):
            return "'" + v + "'"
        if isinstance(v, float):
            # bare float literals type as DECIMAL in DuckDB — cast so the
            # driver's normalizer sees DOUBLE on both engines
            return f"CAST({v:.4f} AS DOUBLE)"
        return str(v)

    rows = ", ".join("(" + ", ".join(lit(r[c]) for c in cols) + ")" for r in _G)
    return f"(VALUES {rows}) AS exp({', '.join(cols)})"


def _shape_groups(stacks: list[np.ndarray]):
    """Yield (index_array, (m, n, h, w) stack) per identical clip shape."""
    shapes = np.array([s.shape for s in stacks])
    for shp in sorted({tuple(s) for s in shapes}):
        (idx,) = np.nonzero((shapes == shp).all(axis=1))
        yield idx, np.stack([stacks[i] for i in idx])


@register(
    "vid_decode_metadata",
    f"""
    SELECT exp.video_id, exp.w, exp.h, exp.n_frames, exp.fps_num,
           exp.fps_den, exp.mean_luma, exp.caption
    FROM {_values_table(['doc_id', 'video_id', 'w', 'h', 'n_frames',
                         'fps_num', 'fps_den', 'mean_luma', 'caption'])}
    JOIN documents d ON d.doc_id = exp.doc_id
    """,
    "Y4M container decode → typed metadata + luma stats + caption equality "
    "(binary video column in, struct out; Arrow-batched mapInPandas, stats "
    "vectorized per clip-shape stack — the U1/U2 analog on the video "
    "modality). Golden-oracle checked",
)
def vid_decode_metadata(spark: SparkSession, sf: str) -> DataFrame:
    vids = _videos_df(spark, sf)

    def decode_stats(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    columns=["video_id", "w", "h", "n_frames", "fps_num",
                             "fps_den", "mean_luma", "caption"]
                )
                continue
            decoded = [y4m_decode(b) for b in pdf["bytes"]]
            clips = [f for f, _ in decoded]
            mean_luma = np.empty(len(clips))
            for idx, stack in _shape_groups(clips):
                mean_luma[idx] = stack.astype(np.float64).mean(axis=(1, 2, 3))
            yield pd.DataFrame(
                {
                    "video_id": pdf["video_id"],
                    "w": [f.shape[2] for f in clips],
                    "h": [f.shape[1] for f in clips],
                    "n_frames": [f.shape[0] for f in clips],
                    "fps_num": [fp[0] for _, fp in decoded],
                    "fps_den": [fp[1] for _, fp in decoded],
                    "mean_luma": np.floor(mean_luma * 10_000 + 0.5) / 10_000,
                    "caption": pdf["caption"],
                }
            )

    return vids.mapInPandas(
        decode_stats,
        "video_id string, w int, h int, n_frames int, fps_num int, "
        "fps_den int, mean_luma double, caption string",
    )


@register(
    "vid_scene_cut_framesample",
    f"""
    SELECT exp.video_id, exp.cut_detected, exp.vhash_re, exp.n_sampled,
           exp.sample_mean
    FROM {_values_table(['doc_id', 'video_id', 'cut_detected', 'vhash_re',
                         'n_sampled', 'sample_mean'])}
    JOIN documents d ON d.doc_id = exp.doc_id
    """,
    "Scene-cut detection (argmax inter-frame delta, exact ints) + stride-4 "
    "keyframe sampling + recomputed temporal-mean vhash that must equal the "
    "landed column (the U4 frame-sample/feature analog on video). "
    "Golden-oracle checked",
)
def vid_scene_cut(spark: SparkSession, sf: str) -> DataFrame:
    vids = _videos_df(spark, sf)

    def scene_cut(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    columns=["video_id", "cut_detected", "vhash_re",
                             "n_sampled", "sample_mean"]
                )
                continue
            clips = [y4m_decode(b)[0] for b in pdf["bytes"]]
            cut = np.empty(len(clips), dtype=np.int64)
            sample_mean = np.empty(len(clips))
            n_sampled = np.empty(len(clips), dtype=np.int64)
            for idx, stack in _shape_groups(clips):
                d = np.abs(np.diff(stack.astype(np.int64), axis=1)).sum(axis=(2, 3))
                cut[idx] = d.argmax(axis=1) + 1
                sampled = stack[:, ::FRAME_STRIDE]
                n_sampled[idx] = sampled.shape[1]
                sample_mean[idx] = sampled.astype(np.float64).mean(axis=(1, 2, 3))
            yield pd.DataFrame(
                {
                    "video_id": pdf["video_id"],
                    "cut_detected": cut,
                    "vhash_re": [vhash64(f) for f in clips],
                    "n_sampled": n_sampled,
                    "sample_mean": np.floor(sample_mean * 10_000 + 0.5) / 10_000,
                }
            )

    return vids.mapInPandas(
        scene_cut,
        "video_id string, cut_detected long, vhash_re long, n_sampled long, "
        "sample_mean double",
    )
