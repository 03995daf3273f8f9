"""D6: sitemap seed expansion — robots sitemaps -> frontier candidates.

The reference's recursive AutoParser (inclusion/parse/auto.rs:114-211) is a
work-queue with depth<=1 index recursion.  Its Spark translation is a fixed
2-round dataflow (SURVEY.md §3.2): round 0 parses all seed sitemaps in one
``mapInPandas``-style UDF pass; index children are fetched (joined to the
body table) and parsed in round 1; children that sniff as another index are
ignored (auto.rs:190-192), unreachable/failed sitemaps are silently skipped
(auto.rs:200-204).  No driver-side iteration over rows — two joins and two
UDF passes regardless of sitemap count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kit_spark.functions.sitemap_udfs import parse_sitemap_docs
from kit_spark.kit_py.crawler import PRIORITY_SITEMAP_DEFAULT


def expand_sitemaps_df(robots_new: DataFrame, sitemap_docs: DataFrame) -> DataFrame:
    """(robots rows with ``sitemaps`` arrays) x (sitemap_url -> body) ->
    candidate rows (url, priority, changefreq, lastmod).

    ``sitemap_docs`` must have columns (sitemap_url, body).
    """
    seeds = (robots_new
             .select(F.explode("sitemaps").alias("sitemap_url"))
             .distinct())
    round0 = parse_sitemap_docs(
        seeds.join(sitemap_docs, "sitemap_url", "left"), "body")

    entries0 = round0.select(F.explode("entries").alias("e"))

    children = (round0.select(F.explode("indexes.loc").alias("sitemap_url"))
                .distinct())
    round1 = parse_sitemap_docs(
        children.join(sitemap_docs, "sitemap_url", "left"), "body")
    # depth<=1: children that sniff as another index are dropped entirely
    entries1 = (round1.where(F.col("kind") != "index")
                .select(F.explode("entries").alias("e")))

    entries = entries0.unionByName(entries1)
    return entries.select(
        F.col("e.loc").alias("url"),
        F.coalesce(F.col("e.priority"),
                   F.lit(PRIORITY_SITEMAP_DEFAULT)).alias("priority"),
        F.col("e.changefreq").alias("changefreq"),
        F.col("e.lastmod").alias("lastmod"),
    )
