"""Image-table synthesis + fetch verification UDFs (D7, multimodal columns).

The image+caption table (BASELINE.json:15 shape) is synthesized
*distributedly*: ``spark.range(n)`` -> ``mapInPandas`` with the deterministic
kimg codec — every executor derives its rows from the row id alone (pure
functions of image_id), so synthesis scales linearly with cores and no
driver-side data ships.  Binary payloads stay inside Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory);
verification returns one boolean+psnr per row and never collects pixels.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from kit_spark.kit_py import codec
from kit_spark.sources.synth import caption_for, image_spec

IMAGES_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
])


def synth_images_df(spark, n_images: int, partitions: int | None = None,
                    img_min: int = 24, img_max: int = 56) -> DataFrame:
    """Distributed deterministic synthesis of the input image table."""
    if partitions is None:
        partitions = max(4, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                image_id = f"img{idx:010d}"
                spec = image_spec(image_id, img_min, img_max)
                pixels = codec.synth_pixels(image_id, spec["w"], spec["h"])
                rows.append({
                    "image_id": image_id,
                    "bytes": codec.encode_image(pixels, spec["fmt"]),
                    "w": spec["w"], "h": spec["h"], "fmt": spec["fmt"],
                    "caption": spec["caption"],
                    "phash": codec.phash64(pixels),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGES_SCHEMA])

    return (spark.range(0, n_images, numPartitions=partitions)
            .mapInPandas(gen, IMAGES_SCHEMA))


VERIFY_STRUCT = T.StructType([
    T.StructField("fetch_ok", T.BooleanType()),
    T.StructField("psnr_db", T.DoubleType()),
    T.StructField("caption_ok", T.BooleanType()),
])


@F.pandas_udf(VERIFY_STRUCT)
def verify_fetch_udf(data: pd.Series, image_id: pd.Series, w: pd.Series,
                     h: pd.Series, fmt: pd.Series,
                     caption: pd.Series) -> pd.DataFrame:
    """Per-row fetch invariant (BASELINE.json:15): decoded-pixel allclose
    (exact for lossless, PSNR>=40dB for lossy) + caption equality against
    the deterministic reference."""
    ok_list, psnr_list, cap_list = [], [], []
    for payload, iid, ww, hh, ff, cap in zip(
            data.tolist(), image_id.tolist(), w.tolist(), h.tolist(),
            fmt.tolist(), caption.tolist()):
        if payload is None:
            ok_list.append(False); psnr_list.append(None); cap_list.append(False)
            continue
        try:
            ok, db = codec.verify_row(bytes(payload), iid, int(ww), int(hh), ff)
        except (ValueError, NotImplementedError):
            ok, db = False, None
        ok_list.append(ok)
        psnr_list.append(None if db is None or db == float("inf") else db)
        cap_list.append(cap == caption_for(iid))
    return pd.DataFrame({"fetch_ok": ok_list, "psnr_db": psnr_list,
                         "caption_ok": cap_list})


# single-eval mark (guide §4.4): consumers filter on fetch_ok/caption_ok
# (images_clean_corpus, curate_job), and a pushed filter on the UDF output
# would otherwise re-run the full image DECODE below the filter — the most
# expensive duplication in the repo at the 10^10-row design point
verify_fetch_udf = verify_fetch_udf.asNondeterministic()


def verify_images(df: DataFrame) -> DataFrame:
    """Append fetch_ok / psnr_db / caption_ok to a joined fetch DataFrame."""
    out = df.withColumn("__v", verify_fetch_udf(
        F.col("bytes"), F.col("image_id"), F.col("w"), F.col("h"),
        F.col("fmt"), F.col("caption")))
    for name in ("fetch_ok", "psnr_db", "caption_ok"):
        out = out.withColumn(name, F.col(f"__v.{name}"))
    return out.drop("__v")


# --- multimodal pipeline stages (resize / feature-extract / frame-sample) ---

RESIZED_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def resize_images(df: DataFrame, target: int = 32) -> DataFrame:
    """Decode -> nearest-neighbor resize to target x target -> re-encode.

    Real numpy the whole way (no image libs needed for NN resampling);
    runs as mapInPandas so pixel data never leaves executors.
    """
    import numpy as np

    def op(batches):
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"],
                                      pdf["fmt"]):
                try:
                    px = codec.decode_image(bytes(data))
                except (ValueError, NotImplementedError):
                    continue  # undecodable/stubbed formats dropped
                ys = (np.arange(target) * px.shape[0] // target)
                xs = (np.arange(target) * px.shape[1] // target)
                small = px[ys][:, xs]
                out["image_id"].append(iid)
                out["bytes"].append(codec.encode_image(small, fmt))
                out["w"].append(target)
                out["h"].append(target)
                out["fmt"].append(fmt)
            yield pd.DataFrame(out, columns=list(out))

    return df.select("image_id", "bytes", "fmt").mapInPandas(op, RESIZED_SCHEMA)


FEATURES_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
    T.StructField("brightness", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])


def extract_features(df: DataFrame) -> DataFrame:
    """Per-image features (mean RGB, brightness, perceptual hash) as a
    vectorized mapInPandas stage — the embedding-extraction stand-in."""
    import numpy as np

    def op(batches):
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "mean_rgb", "brightness",
                                    "phash")}
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    px = codec.decode_image(bytes(data))
                except (ValueError, NotImplementedError):
                    continue
                mean = px.reshape(-1, 3).mean(axis=0)
                rows["image_id"].append(iid)
                rows["mean_rgb"].append([round(float(v), 3) for v in mean])
                rows["brightness"].append(round(float(mean.mean()) / 255, 4))
                rows["phash"].append(codec.phash64(px))
            yield pd.DataFrame(rows, columns=list(rows))

    return df.select("image_id", "bytes").mapInPandas(op, FEATURES_SCHEMA)


VIDEOS_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
])


def synth_videos_df(spark, n_videos: int, partitions: int | None = None,
                    vid_min: int = 16, vid_max: int = 40,
                    max_frames: int = 12) -> DataFrame:
    """Distributed deterministic synthesis of a video+caption table —
    real animated-GIF payloads (kit_py/gif.py), geometry and frame count
    derived from the id alone so executors synthesize independently."""
    from kit_spark.kit_py.gif import synth_video

    if partitions is None:
        partitions = max(4, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                video_id = f"vid{idx:010d}"
                seed = zlib.crc32(video_id.encode())
                w = vid_min + seed % (vid_max - vid_min + 1)
                h = vid_min + (seed >> 8) % (vid_max - vid_min + 1)
                n_frames = 2 + (seed >> 16) % (max_frames - 1)
                rows.append({
                    "video_id": video_id,
                    "bytes": synth_video(video_id, w, h, n_frames),
                    "w": w, "h": h, "n_frames": n_frames, "fmt": "gif",
                    "caption": caption_for(video_id),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEOS_SCHEMA])

    return (spark.range(0, n_videos, numPartitions=partitions)
            .mapInPandas(gen, VIDEOS_SCHEMA))


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling stage for video payloads.

    Animated GIF decodes **for real** (kit_py/gif.py — spec LZW,
    multi-frame compositing); sampled frames re-encode as real PNG so the
    rest of the image pipeline (verify/resize/features) composes.  mp4/avi
    payloads still raise NotImplementedError inside the kernel (no codecs
    in this container) exactly like real jpeg bytes — plug pyav/ffmpeg
    into ``_decode_frames`` on a real cluster.
    """
    from kit_spark.kit_py.gif import decode_gif

    def _decode_frames(data: bytes, every_n: int):
        if data[:6] in (b"GIF87a", b"GIF89a"):
            for no, frame in enumerate(decode_gif(data)):
                if no % every_n == 0:
                    yield no, codec.encode_image(frame, codec.FMT_LOSSLESS)
            return
        if data[:4] in (b"\x00\x00\x00\x18", b"\x00\x00\x00\x20", b"RIFF"):
            raise NotImplementedError("mp4/avi decode requires ffmpeg/pyav")
        raise ValueError("unknown video container")

    id_col = "video_id" if "video_id" in df.columns else "image_id"

    def op(batches):
        for pdf in batches:
            out = {"video_id": [], "frame_no": [], "bytes": []}
            for iid, data in zip(pdf[id_col], pdf["bytes"]):
                try:
                    for no, frame in _decode_frames(bytes(data), every_n):
                        out["video_id"].append(iid)
                        out["frame_no"].append(no)
                        out["bytes"].append(frame)
                except (ValueError, NotImplementedError):
                    continue
            yield pd.DataFrame(out, columns=list(out))

    return df.select(id_col, "bytes").mapInPandas(
        op, "video_id string, frame_no int, bytes binary")


def image_near_dup_pairs(images: DataFrame, max_hamming: int = 3,
                         bands: int = 4,
                         max_bucket: int | None = None) -> DataFrame:
    """Image near-duplicates by perceptual hash — the multimodal leg of the
    dedup suite (text minhash/simhash, embedding LSH, and this).

    The 64-bit ``phash`` column flows through the same pigeonhole blocking
    operator as text SimHash (functions/dedup.py `simhash_near_pairs`): a
    pair within Hamming distance < ``bands`` shares at least one exact
    band, candidates verify the true distance with ``bit_count`` — never
    all-pairs, pure Catalyst after synthesis.  Returns (a, b, hamming).

    Scale note: band width is 64/bands bits, so expected bucket size is
    corpus/2^(64/bands); bands=4 (16-bit bands) guarantees recall through
    Hamming 3 while keeping buckets bounded at the 10^10 design point —
    raising recall to larger distances (more, narrower bands) trades
    quadratically larger buckets, exactly as for SimHash."""
    from kit_spark.functions.dedup import simhash_near_pairs

    sim = images.select(F.col("image_id").alias("doc_id"),
                        F.col("phash").alias("simhash"))
    pairs = simhash_near_pairs(sim, max_hamming=max_hamming, bits=64,
                               bands=bands, max_bucket=max_bucket)
    return pairs  # (a, b, hamming) with image ids in a/b


def verify_video_frames(frames_df: DataFrame, videos_df: DataFrame) -> DataFrame:
    """Per-frame fetch invariant for the video path: decode each sampled
    PNG frame and compare *exactly* (GIF and PNG are both lossless) against
    the deterministic reference frame for (video_id, frame_no)."""
    import numpy as np

    from kit_spark.kit_py.gif import synth_video_frame

    geom = videos_df.select("video_id", "w", "h")
    joined = frames_df.join(geom, "video_id")

    def op(batches):
        for pdf in batches:
            ok = []
            for iid, no, data, w, h in zip(pdf["video_id"], pdf["frame_no"],
                                           pdf["bytes"], pdf["w"], pdf["h"]):
                try:
                    got = codec.decode_image(bytes(data))
                    ok.append(bool(np.array_equal(
                        got, synth_video_frame(iid, int(w), int(h), int(no)))))
                except (ValueError, NotImplementedError):
                    ok.append(False)
            out = pdf[["video_id", "frame_no"]].copy()
            out["frame_ok"] = ok
            yield out

    return joined.mapInPandas(
        op, "video_id string, frame_no int, frame_ok boolean")
