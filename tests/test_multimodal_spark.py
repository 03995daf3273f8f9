"""Spark-side multimodal pipeline tests — the rows-only catalog entries
(image/audio/video codecs) that the DuckDB oracle gate cannot replay.
Asserts the per-row invariants hold through the distributed path: real-PNG
lossless round-trip, GIF frame sampling with exact pixel verification,
resize/feature composition."""

import pytest

from kit_spark.functions.images import (extract_features, resize_images,
                                        sample_video_frames, synth_images_df,
                                        synth_videos_df, verify_images,
                                        verify_video_frames)


def test_image_synthesis_verifies_and_lossless_is_real_png(spark):
    images = synth_images_df(spark, 40, partitions=4)
    verified = verify_images(images).cache()
    rows = verified.select("fmt", "fetch_ok", "caption_ok", "psnr_db").collect()
    assert len(rows) == 40
    assert all(r.fetch_ok and r.caption_ok for r in rows)
    for r in rows:
        if r.fmt == "png":
            assert r.psnr_db is None  # exact round-trip, psnr = inf -> null
        else:
            assert r.psnr_db >= 40.0
    # the lossless payloads really are PNG containers
    magic = [bytes(r.bytes)[:8] for r in
             images.where("fmt = 'png'").select("bytes").limit(5).collect()]
    assert magic and all(m == b"\x89PNG\r\n\x1a\n" for m in magic)
    verified.unpersist()


def test_resize_and_features_compose(spark):
    images = synth_images_df(spark, 24, partitions=4)
    feats = extract_features(resize_images(images, target=16)).collect()
    assert len(feats) == 24
    assert all(0.0 <= r.brightness <= 1.0 and len(r.mean_rgb) == 3
               for r in feats)


def test_video_frames_sample_and_verify_exactly(spark):
    videos = synth_videos_df(spark, 20, partitions=4).cache()
    frames = sample_video_frames(videos, every_n=2)
    verified = verify_video_frames(frames, videos).cache()
    rows = verified.collect()
    assert rows and all(r.frame_ok for r in rows)
    # every video contributes ceil(n_frames / 2) sampled frames
    expect = {r.video_id: (r.n_frames + 1) // 2
              for r in videos.select("video_id", "n_frames").collect()}
    got: dict = {}
    for r in rows:
        got[r.video_id] = got.get(r.video_id, 0) + 1
    assert got == expect
    videos.unpersist()
    verified.unpersist()


def test_image_near_dup_finds_decoded_twins(spark):
    """phash banding must pair every lossy image with the twin whose hash
    was recomputed from its decoded JPEG payload (true codec distortion)."""
    from pyspark.sql import functions as F

    from kit_spark.functions.images import image_near_dup_pairs

    images = synth_images_df(spark, 60, partitions=4).cache()
    base = images.select("image_id", "phash")
    twins = (extract_features(images.where(F.col("fmt") == "jpeg"))
             .select(F.concat(F.col("image_id"), F.lit("~dup"))
                     .alias("image_id"), "phash"))
    pairs = image_near_dup_pairs(base.unionByName(twins), max_hamming=3)
    found = {(r.a, r.b) for r in pairs.collect()}
    jpeg_ids = [r.image_id
                for r in images.where("fmt = 'jpeg'").select("image_id").collect()]
    assert jpeg_ids
    for iid in jpeg_ids:
        assert (iid, iid + "~dup") in found or (iid + "~dup", iid) in found, \
            f"twin not recovered for {iid}"
    images.unpersist()


def test_video_every_n_one_samples_all_frames(spark):
    videos = synth_videos_df(spark, 6, partitions=2)
    n_frames = {r.video_id: r.n_frames
                for r in videos.select("video_id", "n_frames").collect()}
    frames = sample_video_frames(videos, every_n=1)
    counts = frames.groupBy("video_id").count().collect()
    assert {r.video_id: r["count"] for r in counts} == n_frames
