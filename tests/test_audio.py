"""Audio multimodal path: real WAV codec (stdlib), distributed synthesis,
per-row lossless verification, numpy feature extraction."""

import numpy as np
from pyspark.sql import functions as F

from kit_spark.functions.audio import (SR, _spec, decode_wav, encode_wav,
                                       extract_audio_features, synth_audio_df,
                                       synth_samples, verify_audio)


def test_wav_roundtrip_lossless():
    samples = synth_samples("aud0000000007")
    sr, decoded = decode_wav(encode_wav(samples))
    assert sr == SR
    assert np.array_equal(decoded, samples)


def test_decode_rejects_garbage():
    import pytest

    for bad in (b"", b"RIFFxxxxJUNK", b"\x00" * 100):
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_audio_synth_verify_features(spark):
    clips = synth_audio_df(spark, 64).cache()
    v = verify_audio(clips).agg(
        F.sum(F.col("fetch_ok").cast("long")).alias("ok"),
        F.sum(F.col("caption_ok").cast("long")).alias("cap"),
        F.count("*").alias("n")).collect()[0]
    assert v["ok"] == v["n"] == v["cap"] == 64

    feats = {r["audio_id"]: r for r in extract_audio_features(clips).collect()}
    assert len(feats) == 64
    for aid, row in feats.items():
        spec = _spec(aid)
        # FFT dominant bin lands on the fundamental (resolution sr/n)
        assert abs(row["dom_freq_hz"] - spec["freq"]) <= SR / (SR // 4), aid
        assert 0.25 <= row["duration_s"] <= 1.3
        # sqrt(0.6^2/2 + 0.25^2/2) * 20000/32768 ~= 0.28
        assert 0.2 < row["rms"] < 0.4


def test_corrupted_payload_fails_verify(spark):
    clips = synth_audio_df(spark, 4)
    corrupted = clips.withColumn(
        "bytes",
        F.when(F.col("audio_id") == "aud0000000000",
               F.lit(b"RIFFgarbage")).otherwise(F.col("bytes")))
    rows = {r["audio_id"]: r["fetch_ok"]
            for r in verify_audio(corrupted).collect()}
    assert rows["aud0000000000"] is False
    assert all(ok for aid, ok in rows.items() if aid != "aud0000000000")
