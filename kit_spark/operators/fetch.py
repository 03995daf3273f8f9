"""D7: simulated fetch executor — scheduled URLs x image table + verification.

The deterministic stand-in for network fetching: a scheduled URL whose path
matches ``/img/<image_id>.<fmt>`` resolves to a row of the image+caption
input table (BASELINE.json:15); the fetched payload is then verified per-row
(decoded-pixel PSNR/exactness + caption equality) entirely inside executors
— the driver only ever sees aggregated booleans (SURVEY.md §7.4 risk 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kit_spark.functions.images import verify_images

_IMG_PATH_RE = r"/img/(img[0-9]+)\.(png|jpeg)$"


def with_image_id(df: DataFrame, url_col: str = "url_canon") -> DataFrame:
    return df.withColumn(
        "image_id",
        F.nullif(F.regexp_extract(F.col(url_col), _IMG_PATH_RE, 1), F.lit("")))


def fetch_and_verify(scheduled: DataFrame, images: DataFrame,
                     broadcast_images: bool = False) -> DataFrame:
    """Join scheduled fetches to the image table and verify the invariant.

    Returns the schedule columns + (image_id, fetch_ok, psnr_db, caption_ok,
    fetched_bytes).  Non-image URLs (no path match) carry null image_id and
    fetch_ok=false.  At scale both sides shuffle on image_id (images is the
    100 TB side — never broadcast it; ``broadcast_images`` exists for tiny
    test fixtures only).
    """
    keyed = with_image_id(scheduled)
    img = F.broadcast(images) if broadcast_images else images
    joined = keyed.join(img, "image_id", "left")
    verified = verify_images(joined)
    return verified.select(
        *[c for c in scheduled.columns],
        "image_id", "fetch_ok", "psnr_db", "caption_ok",
        F.coalesce(F.length("bytes"), F.lit(0)).alias("fetched_bytes"),
    )
