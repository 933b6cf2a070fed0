"""Multimodal audio operators — binary WAV payload columns + pandas-UDF stages.

The audio leg of the multimodal battery: same plumbing contract as the image
leg (operators/multimodal.py — opaque ``binary`` column + typed metadata,
Arrow-batched ``mapInPandas``, per-shape vectorized stats, golden-value
oracles), over a REAL RIFF/WAVE PCM-16 codec (datagen/audio.py). Mirrors the
reference's per-record payload decode (SURVEY.md §2.8 U1/U2/U4/U5 shapes;
reference kernel analog: analyseHPHT.py per-record file parse) on a second
modality, as a 100 TB training-data pipeline needs.

Input: an audio landing-table analog GENERATED ON THE EXECUTORS from the
sf-scaled ``documents`` table (one clip per doc_id < AU_MAX_DOC), so row
count scales with sf and nothing is fabricated on the driver.

Oracles: golden expected-value tables computed AT IMPORT TIME by the pure
numpy codec path (no Spark) and rendered as VALUES literals joined against
``documents`` — DuckDB checks values, not just row counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen.audio import afp64, make_audios, wav_decode
from .base import load, register

AU_MAX_DOC = 120
N_ENV_FRAMES = 16

AU_SCHEMA = (
    "doc_id long, url_canon string, audio_id string, bytes binary, sr int, "
    "n_samples int, channels int, transcript string, afp long"
)
_AU_COLS = [c.split()[0] for c in AU_SCHEMA.split(", ")]


def _au_urls(doc_ids: list[int]) -> list[str]:
    return [f"http://aud{d % 9}.test/clip/{d}" for d in doc_ids]


def _audios_df(spark: SparkSession, sf: str) -> DataFrame:
    """The audio+transcript landing table for this sf: one deterministic WAV
    clip per stored doc_id, synthesized executor-side in Arrow batches
    (datagen/audio.py make_audios, batch-stacked per (sr, dur, ch))."""
    docs = (
        load(spark, sf, "documents").select("doc_id").filter(F.col("doc_id") < AU_MAX_DOC)
    )

    def gen(batches):
        for pdf in batches:
            ids = [int(x) for x in pdf["doc_id"]]
            if not ids:
                yield pd.DataFrame(columns=_AU_COLS)
                continue
            urls = _au_urls(ids)
            recs = make_audios(urls)
            yield pd.DataFrame(
                [{"doc_id": d, "url_canon": u, **r} for d, u, r in zip(ids, urls, recs)]
            )

    return docs.mapInPandas(gen, AU_SCHEMA)


def _round4(x: float) -> float:
    """Spark/DuckDB ROUND HALF_UP semantics at 4dp for positive values."""
    import math

    return math.floor(x * 10_000 + 0.5) / 10_000


def _env16(pcm: np.ndarray) -> np.ndarray:
    """16-frame RMS envelope of the mono mix — the frame-sample / feature
    kernel shared by the Spark stage and the golden generator."""
    mono = pcm.astype(np.float64).mean(axis=1)
    n = len(mono) - (len(mono) % N_ENV_FRAMES)
    frames = mono[:n].reshape(N_ENV_FRAMES, -1)
    return np.sqrt((frames**2).mean(axis=1))


# ------------------------------------------------------------------ goldens
def _golden() -> list[dict]:
    """Expected per-clip values for every possible doc_id, computed by the
    pure numpy codec path (no Spark). The oracle joins these against the
    sf's stored documents so only rows that exist at this sf are checked."""
    ids = list(range(AU_MAX_DOC))
    recs = make_audios(_au_urls(ids))
    rows = []
    for d, rec in zip(ids, recs):
        pcm, sr = wav_decode(rec["bytes"])
        f64 = pcm.astype(np.float64)
        env = _env16(pcm)
        rows.append(
            {
                "doc_id": d,
                "audio_id": rec["audio_id"],
                "sr": sr,
                "n_samples": int(pcm.shape[0]),
                "channels": int(pcm.shape[1]),
                "rms": _round4(float(np.sqrt((f64**2).mean()))),
                "peak": int(np.abs(f64).max()),
                "transcript": rec["transcript"],
                "afp": int(rec["afp"]),
                "env_mean": _round4(float(env.mean())),
                "env_peak_frame": int(env.argmax()),
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


def _shape_groups(pcms: list[np.ndarray]):
    """Yield (index_array, (n, samples, ch) stack) per identical PCM shape —
    the batch-vectorization discipline of mm_decode_metadata."""
    shapes = np.array([p.shape for p in pcms])
    for shp in sorted({tuple(s) for s in shapes}):
        (idx,) = np.nonzero((shapes == shp).all(axis=1))
        yield idx, np.stack([pcms[i] for i in idx])


@register(
    "au_decode_metadata",
    f"""
    SELECT exp.audio_id, exp.sr, exp.n_samples, exp.channels, exp.rms,
           exp.peak, exp.transcript
    FROM {_values_table(['doc_id', 'audio_id', 'sr', 'n_samples', 'channels',
                         'rms', 'peak', 'transcript'])}
    JOIN documents d ON d.doc_id = exp.doc_id
    """,
    "WAV decode → typed metadata + amplitude stats + transcript equality "
    "(binary audio column in, struct out; Arrow-batched mapInPandas, stats "
    "vectorized per shape stack — the U1/U2 analog on the audio modality). "
    "Golden-oracle checked",
)
def au_decode_metadata(spark: SparkSession, sf: str) -> DataFrame:
    auds = _audios_df(spark, sf)

    def decode_stats(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    columns=["audio_id", "sr", "n_samples", "channels", "rms",
                             "peak", "transcript"]
                )
                continue
            decoded = [wav_decode(b) for b in pdf["bytes"]]
            pcms = [p for p, _ in decoded]
            rms = np.empty(len(pcms))
            peak = np.empty(len(pcms), dtype=np.int64)
            for idx, stack in _shape_groups(pcms):
                f64 = stack.astype(np.float64)  # (n, samples, ch)
                rms[idx] = np.sqrt((f64**2).mean(axis=(1, 2)))
                peak[idx] = np.abs(f64).max(axis=(1, 2)).astype(np.int64)
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "sr": [s for _, s in decoded],
                    "n_samples": [p.shape[0] for p in pcms],
                    "channels": [p.shape[1] for p in pcms],
                    "rms": np.floor(rms * 10_000 + 0.5) / 10_000,
                    "peak": peak,
                    "transcript": pdf["transcript"],
                }
            )

    return auds.mapInPandas(
        decode_stats,
        "audio_id string, sr int, n_samples int, channels int, rms double, "
        "peak long, transcript string",
    )


@register(
    "au_frame_envelope",
    f"""
    SELECT exp.audio_id, exp.env_mean, exp.env_peak_frame, exp.afp AS afp_re
    FROM {_values_table(['doc_id', 'audio_id', 'env_mean', 'env_peak_frame',
                         'afp'])}
    JOIN documents d ON d.doc_id = exp.doc_id
    """,
    "Frame-sample + feature-extract: 16-frame RMS envelope of the mono mix "
    "and a recomputed 64-bit fingerprint that must equal the landed column "
    "(the U4 per-record feature analog on audio). Golden-oracle checked",
)
def au_frame_envelope(spark: SparkSession, sf: str) -> DataFrame:
    auds = _audios_df(spark, sf)

    def envelope(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    columns=["audio_id", "env_mean", "env_peak_frame", "afp_re"]
                )
                continue
            decoded = [wav_decode(b) for b in pdf["bytes"]]
            pcms = [p for p, _ in decoded]
            env_mean = np.empty(len(pcms))
            env_peak = np.empty(len(pcms), dtype=np.int64)
            for idx, stack in _shape_groups(pcms):
                mono = stack.astype(np.float64).mean(axis=2)  # (n, samples)
                ns = mono.shape[1] - (mono.shape[1] % N_ENV_FRAMES)
                frames = mono[:, :ns].reshape(len(idx), N_ENV_FRAMES, -1)
                env = np.sqrt((frames**2).mean(axis=2))  # (n, 16)
                env_mean[idx] = env.mean(axis=1)
                env_peak[idx] = env.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "env_mean": np.floor(env_mean * 10_000 + 0.5) / 10_000,
                    "env_peak_frame": env_peak,
                    "afp_re": [
                        afp64(p, s) for p, s in decoded
                    ],  # per-row FFT; tiny (17-frame) transforms
                }
            )

    return auds.mapInPandas(
        envelope,
        "audio_id string, env_mean double, env_peak_frame long, afp_re long",
    )


@register(
    "au_afp_near_dup_bands",
    f"""
    WITH clips AS (
      SELECT exp.audio_id, exp.afp
      FROM {_values_table(['doc_id', 'audio_id', 'afp'])}
      JOIN documents d ON d.doc_id = exp.doc_id),
    bands AS (
      SELECT audio_id, b.b AS band, (afp >> (b.b * 8)) & 255 AS band_val
      FROM clips, (SELECT unnest(range(0, 8)) AS b) b)
    SELECT a.audio_id AS clip_a, b.audio_id AS clip_b,
           count(DISTINCT a.band) AS n_band_hits
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_val = b.band_val
     AND a.audio_id < b.audio_id
    GROUP BY a.audio_id, b.audio_id
    """,
    "Near-dup candidate pairs by 8-bit fingerprint band equality (the J7 "
    "blocked similarity join on the audio modality): band bucket equi-join, "
    "candidates scale with bucket size, never n². Golden-oracle checked",
)
def au_afp_bands(spark: SparkSession, sf: str) -> DataFrame:
    _audios_df(spark, sf).createOrReplaceTempView("v_au_clips")
    return spark.sql("""
        WITH bands AS (
          SELECT audio_id, b AS band,
                 shiftright(afp, b * 8) & 255 AS band_val
          FROM v_au_clips LATERAL VIEW explode(sequence(0, 7)) AS b)
        SELECT a.audio_id AS clip_a, b.audio_id AS clip_b,
               count(DISTINCT a.band) AS n_band_hits
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_val = b.band_val
         AND a.audio_id < b.audio_id
        GROUP BY a.audio_id, b.audio_id
    """)
