"""Distributed sitemap sink round-trip (S10-S13 supersession of the
reference's todo!() AutoBuilder)."""

from pyspark.sql import functions as F

from kit_spark.kit_py.sitemaps import parse_index, parse_sitemap
from kit_spark.operators.sitemap_sink import (render_sitemap_files,
                                              render_sitemap_index)


def test_split_and_round_trip(spark):
    urls = spark.createDataFrame(
        [(f"https://e.com/p{i:05d}", float(i % 10) / 10.0) for i in range(257)],
        "loc string, priority double")
    files = render_sitemap_files(urls, "https://e.com", kind="urlset",
                                 records_per_file=100).cache()
    rows = {r["file_no"]: r for r in files.collect()}
    assert sorted(rows) == [0, 1, 2]
    assert [rows[i]["n_records"] for i in (0, 1, 2)] == [100, 100, 57]
    # every file parses back, limits respected, all URLs recovered once
    seen = []
    for r in rows.values():
        parsed = parse_sitemap(r["body"])
        assert parsed.kind == "urlset" and parsed.error is None
        seen += [e["loc"] for e in parsed.entries]
        # priorities survive the %.1f rendering
        assert all(e["priority"] in {i / 10 for i in range(10)}
                   for e in parsed.entries)
    assert sorted(seen) == sorted(r["loc"] for r in urls.collect())
    # index document lists all files
    index = parse_index(render_sitemap_index(files))
    assert [i["loc"] for i in index.indexes] == [
        "https://e.com/sitemap-00000.xml", "https://e.com/sitemap-00001.xml",
        "https://e.com/sitemap-00002.xml"]


def test_txt_sink(spark):
    urls = spark.createDataFrame([(f"https://e.com/t{i}",) for i in range(5)],
                                 "loc string")
    files = render_sitemap_files(urls, "https://e.com", kind="txt")
    row = files.collect()[0]
    parsed = parse_sitemap(row["body"])
    assert parsed.kind == "txt"
    assert len(parsed.entries) == 5


def test_vectorized_render_matches_builder(spark):
    """The applyInPandas render is vectorized pandas string ops; the kit_py
    EntryBuilder stays the golden scalar kernel. Pin them byte-for-byte over
    nulls, XML-escapable text, microsecond lastmods, and the full %.1f
    priority grid (incl. the 0.15/0.25 ties where naive round-tricks like
    np.round(v*10) diverge from correctly-rounded printf)."""
    import datetime as dt

    from kit_spark.kit_py.builders import EntryBuilder

    rows = []
    freqs = [None, "daily", "weekly", None, "hourly"]
    for i in range(120):
        loc = f"https://e.com/a&b<c>'d\"{i:04d}"
        lastmod = (None if i % 3 == 0 else
                   dt.datetime(2026, 1, 1 + i % 27, i % 24, i % 60, i % 60,
                               microsecond=(i * 12_345) % 1_000_000))
        priority = None if i % 5 == 0 else round(i % 101 / 100, 2)
        if i in (15, 25):
            priority = i / 100  # 0.15 / 0.25: decimal-rounding tie cases
        rows.append((loc, lastmod, priority, freqs[i % 5]))

    urls = spark.createDataFrame(
        rows, "loc string, lastmod timestamp, priority double, "
              "changefreq string")
    files = render_sitemap_files(urls, "https://e.com", kind="urlset")
    body = files.collect()[0]["body"]

    builder = EntryBuilder()
    for loc, lastmod, priority, changefreq in sorted(rows):
        builder.write(loc, lastmod=lastmod, priority=priority,
                      changefreq=changefreq)
    assert body == builder.close()
