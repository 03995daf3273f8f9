"""S10-S13: distributed sitemap sinks with protocol limits.

The reference writes one sitemap at a time (EntryBuilder/IndexBuilder/
PlainBuilder, inclusion/build/); its size-based auto-splitter is an
unimplemented stub (todo!() at inclusion/build/auto.rs:25-55).  The
distributed version supersedes it: a URL DataFrame of any size is split
into <=50,000-record files (inclusion/record/mod.rs:13) via the same
deterministic global sequence used for crawl ordering, each file rendered
by one ``applyInPandas`` group through the kit_py builders (which enforce
the 50 MiB byte limit per file, mod.rs:17), plus a sitemap-index document
listing the generated files.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from kit_spark.kit_py.builders import EntryBuilder, IndexBuilder, PlainBuilder
from kit_spark.kit_py.records import RECORD_LIMIT
from kit_spark.operators.frontier import global_sequence


def render_sitemap_files(urls: DataFrame, base_url: str,
                         kind: str = "urlset",
                         records_per_file: int = RECORD_LIMIT) -> DataFrame:
    """(loc[, lastmod, priority, changefreq]) rows -> one row per rendered
    sitemap file: (file_no, sitemap_url, body, n_records).

    Files split on the deterministic order (loc asc) so output is stable;
    per-file rendering happens executor-side through the kit_py builders.
    """
    if records_per_file > RECORD_LIMIT:
        raise ValueError(f"records_per_file > protocol limit {RECORD_LIMIT}")
    cols = urls.columns
    seq = global_sequence(urls, [F.col("loc").asc()], seq_col="__seq")
    with_file = seq.withColumn(
        "file_no", (F.col("__seq") / records_per_file).cast("int"))

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__seq")
        file_no = int(pdf["file_no"].iloc[0])
        if kind == "txt":
            builder = PlainBuilder()
            for loc in pdf["loc"]:
                builder.write(loc)
            ext = "txt"
        else:
            builder = EntryBuilder()
            for _, row in pdf.iterrows():
                builder.write(
                    row["loc"],
                    lastmod=row.get("lastmod") if "lastmod" in cols else None,
                    priority=row.get("priority") if "priority" in cols else None,
                    changefreq=(row.get("changefreq")
                                if "changefreq" in cols else None),
                )
            ext = "xml"
        return pd.DataFrame({
            "file_no": [file_no],
            "sitemap_url": [f"{base_url}/sitemap-{file_no:05d}.{ext}"],
            "body": [builder.close()],
            "n_records": [len(pdf)],
        })

    return with_file.groupBy("file_no").applyInPandas(
        render,
        "file_no int, sitemap_url string, body string, n_records long")


def render_sitemap_index(files: DataFrame) -> str:
    """S11: one sitemap-index document over the rendered files (driver-side;
    the file list is #files-sized, tiny by construction)."""
    builder = IndexBuilder()
    for row in files.select("sitemap_url").orderBy("sitemap_url").collect():
        builder.write(row["sitemap_url"])
    return builder.close()


def write_sitemap_tree(urls: DataFrame, base_url: str, out_dir: str,
                       kind: str = "urlset") -> dict:
    """Render + persist the whole tree (files as parquet rows for snapshot
    storage; text export is one `.write.text` away)."""
    files = render_sitemap_files(urls, base_url, kind).cache()
    files.write.mode("overwrite").parquet(f"{out_dir}/sitemap_files")
    index_body = render_sitemap_index(files)
    n = files.count()
    files.unpersist()
    with open(f"{out_dir.replace('file:', '')}/sitemap-index.xml", "w",
              encoding="utf-8") as fh:
        fh.write(index_body)
    return {"files": n, "index": f"{out_dir}/sitemap-index.xml"}
