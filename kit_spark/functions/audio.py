"""Audio-table synthesis + feature extraction (multimodal binary columns).

Audio payloads here are REAL RIFF/WAVE files (PCM16 mono) built and parsed
with stdlib ``struct`` + numpy — unlike the video stage no external codec
is needed, so this multimodal path decodes genuinely end to end:
deterministic sine-mixture synthesis keyed by audio_id -> WAV encode ->
distributed decode + per-row sample-exact verification (PCM is lossless)
-> feature extraction (duration, RMS, zero-crossing rate, dominant
frequency via numpy rFFT).  Payloads stay inside Arrow batches on
executors; batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` exactly as for images.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

SR = 8_000  # fixed sample rate for the synthetic corpus


def _spec(audio_id: str) -> dict:
    """Deterministic per-id synthesis parameters (pure function of the id)."""
    h = hashlib.md5(audio_id.encode()).digest()
    freq = 200.0 + int.from_bytes(h[0:4], "big") % 1800
    n = SR // 4 + int.from_bytes(h[4:8], "big") % SR  # 0.25s .. 1.25s
    harmonic = 2 + h[8] % 3
    return {"freq": freq, "n": n, "harmonic": harmonic,
            "caption": f"tone {freq:.0f}Hz x{harmonic} ({audio_id})"}


def synth_samples(audio_id: str) -> np.ndarray:
    """int16 PCM mono: fundamental + one harmonic, deterministic."""
    s = _spec(audio_id)
    t = np.arange(s["n"], dtype=np.float64) / SR
    wave = (0.6 * np.sin(2 * np.pi * s["freq"] * t)
            + 0.25 * np.sin(2 * np.pi * s["freq"] * s["harmonic"] * t))
    return np.round(wave * 20_000).astype(np.int16)


def encode_wav(samples: np.ndarray, sr: int = SR) -> bytes:
    """Minimal canonical RIFF/WAVE container (PCM16 mono)."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sr, sr * 2, 2, 16, b"data", len(data))
    return hdr + data


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Parse the canonical header; raises ValueError on malformed input."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (fmt_len, audio_fmt, channels, sr) = struct.unpack("<IHHI", data[16:28])
    if fmt_len != 16 or audio_fmt != 1 or channels != 1:
        raise ValueError("unsupported WAVE layout")
    (n_bytes,) = struct.unpack("<I", data[40:44])
    samples = np.frombuffer(data[44:44 + n_bytes], dtype="<i2")
    return sr, samples


AUDIO_SCHEMA = T.StructType([
    T.StructField("audio_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("sr", T.IntegerType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
])


def synth_audio_df(spark, n_clips: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic synthesis of the audio+caption table
    (same shape discipline as the image table: opaque binary + typed
    metadata + caption)."""
    if partitions is None:
        partitions = max(4, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                audio_id = f"aud{idx:010d}"
                samples = synth_samples(audio_id)
                rows.append({
                    "audio_id": audio_id,
                    "bytes": encode_wav(samples),
                    "sr": SR, "n_samples": int(samples.size), "fmt": "wav",
                    "caption": _spec(audio_id)["caption"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA])

    return (spark.range(0, n_clips, numPartitions=partitions)
            .mapInPandas(gen, AUDIO_SCHEMA))


VERIFY_STRUCT = T.StructType([
    T.StructField("fetch_ok", T.BooleanType()),
    T.StructField("caption_ok", T.BooleanType()),
])


@F.pandas_udf(VERIFY_STRUCT)
def verify_audio_udf(data: pd.Series, audio_id: pd.Series,
                     caption: pd.Series) -> pd.DataFrame:
    """Per-row invariant, audio flavor: PCM is lossless so decoded samples
    must equal the deterministic reference exactly; caption equality as
    for images (BASELINE.json:15 discipline applied to the audio column)."""
    ok_list, cap_list = [], []
    for payload, aid, cap in zip(data.tolist(), audio_id.tolist(),
                                 caption.tolist()):
        try:
            sr, samples = decode_wav(bytes(payload))
            ok = sr == SR and np.array_equal(samples, synth_samples(aid))
        except (ValueError, TypeError):
            ok = False
        ok_list.append(ok)
        cap_list.append(cap == _spec(aid)["caption"])
    return pd.DataFrame({"fetch_ok": ok_list, "caption_ok": cap_list})


# single-eval mark, as for verify_fetch_udf: filters on fetch_ok/caption_ok
# must not re-run the WAV decode below a pushed filter (guide §4.4)
verify_audio_udf = verify_audio_udf.asNondeterministic()


def verify_audio(df: DataFrame) -> DataFrame:
    out = df.withColumn("__v", verify_audio_udf(
        F.col("bytes"), F.col("audio_id"), F.col("caption")))
    return (out.withColumn("fetch_ok", F.col("__v.fetch_ok"))
            .withColumn("caption_ok", F.col("__v.caption_ok")).drop("__v"))


FEATURES_SCHEMA = T.StructType([
    T.StructField("audio_id", T.StringType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("dom_freq_hz", T.DoubleType()),
])


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Duration / RMS / zero-crossing rate / FFT dominant frequency per
    clip — vectorized numpy inside mapInPandas, samples never leave the
    executor."""

    def op(batches):
        for pdf in batches:
            rows = {k: [] for k in ("audio_id", "duration_s", "rms", "zcr",
                                    "dom_freq_hz")}
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    sr, samples = decode_wav(bytes(data))
                except (ValueError, TypeError):
                    continue
                x = samples.astype(np.float64) / 32768.0
                spectrum = np.abs(np.fft.rfft(x))
                dom = float(np.argmax(spectrum) * sr / max(x.size, 1))
                rows["audio_id"].append(aid)
                rows["duration_s"].append(round(x.size / sr, 4))
                rows["rms"].append(round(float(np.sqrt(np.mean(x * x))), 4))
                rows["zcr"].append(round(
                    float(np.mean(np.abs(np.diff(np.signbit(x))))), 4))
                rows["dom_freq_hz"].append(round(dom, 1))
            yield pd.DataFrame(rows, columns=list(rows))

    return df.select("audio_id", "bytes").mapInPandas(op, FEATURES_SCHEMA)
