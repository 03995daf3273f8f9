"""Sitemap parse UDFs (S5-S8) — one vectorized call per sitemap document.

The kernel is ``kit_spark.kit_py.sitemaps``; each document yields arrays of
entry/index structs that the caller explodes (UDTF-style).  Record/byte
limits (50,000 URLs / 50 MiB, inclusion/record/mod.rs:13-17) are enforced by
the kernel per document; the ``error`` field surfaces limit hits for the
metrics table while already-parsed records are kept — matching the
reference's keep-then-error observable behavior.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

from kit_spark.kit_py.sitemaps import parse_sitemap

ENTRY_STRUCT = T.StructType([
    T.StructField("loc", T.StringType()),
    T.StructField("lastmod", T.TimestampType()),
    T.StructField("changefreq", T.StringType()),
    T.StructField("priority", T.DoubleType()),
])

INDEX_STRUCT = T.StructType([
    T.StructField("loc", T.StringType()),
    T.StructField("lastmod", T.TimestampType()),
])

SITEMAP_PARSE_STRUCT = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("error", T.StringType()),
    T.StructField("entries", T.ArrayType(ENTRY_STRUCT)),
    # child sitemaps: (loc, lastmod) — the reference Index record carries
    # the optional modified timestamp too (inclusion/record/index.rs:15-18)
    T.StructField("indexes", T.ArrayType(INDEX_STRUCT)),
])


@F.pandas_udf(SITEMAP_PARSE_STRUCT)
def parse_sitemap_udf(body: pd.Series) -> pd.DataFrame:
    out = {"kind": [], "error": [], "entries": [], "indexes": []}
    for doc in body.tolist():
        if doc is None:
            out["kind"].append(None)
            out["error"].append("missing")
            out["entries"].append([])
            out["indexes"].append([])
            continue
        result = parse_sitemap(doc)
        out["kind"].append(result.kind)
        out["error"].append(result.error)
        out["entries"].append([
            {"loc": e["loc"],
             "lastmod": pd.Timestamp(e["lastmod"]) if e["lastmod"] else None,
             "changefreq": e.get("changefreq"),
             "priority": e.get("priority")}
            for e in result.entries
        ])
        out["indexes"].append([
            {"loc": i["loc"],
             "lastmod": pd.Timestamp(i["lastmod"]) if i.get("lastmod")
             else None}
            for i in result.indexes
        ])
    return pd.DataFrame(out)


def parse_sitemap_docs(df, body_col: str = "body"):
    """body column -> (kind, error, entries array, indexes array) columns."""
    out = df.withColumn("__p", parse_sitemap_udf(F.col(body_col)))
    for name in ("kind", "error", "entries", "indexes"):
        out = out.withColumn(name, F.col(f"__p.{name}"))
    return out.drop("__p")
