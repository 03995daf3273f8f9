"""Sitemap parsing/building kernel tests (S5-S12)."""

import datetime as dt

from kit_spark.kit_py import sitemaps as S
from kit_spark.kit_py.builders import (EntryBuilder, IndexBuilder,
                                       PlainBuilder, RobotsBuilder)
from kit_spark.kit_py.records import (format_lastmod, is_outdated, next_date,
                                      parse_frequency, parse_lastmod,
                                      parse_priority)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <url>
        <loc>https://www.example.com/file1.html</loc>
        <lastmod>2022-09-08T10:43:13.000-04:00</lastmod>
        <changefreq>daily</changefreq>
        <priority>0.6</priority>
    </url>
    <url>
        <loc>https://www.example.com/file2.html</loc>
        <priority>1.7</priority>
        <changefreq>sometimes</changefreq>
    </url>
    <url><lastmod>2022-01-01</lastmod></url>
</urlset>"""


def test_parse_urlset():
    # reference fixture: inclusion/parse/entry.rs:203-215
    r = S.parse_urlset(URLSET)
    assert r.kind == "urlset" and r.error is None
    assert len(r.entries) == 2  # third record has no <loc> -> dropped (F2)
    e = r.entries[0]
    assert e["loc"] == "https://www.example.com/file1.html"
    assert e["lastmod"] == dt.datetime(2022, 9, 8, 14, 43, 13, tzinfo=dt.timezone.utc)
    assert e["changefreq"] == "daily"
    assert e["priority"] == 0.6
    # invalid priority/changefreq -> None (lenient, entry.rs:106-114)
    assert r.entries[1]["priority"] is None
    assert r.entries[1]["changefreq"] is None


def test_parse_index_and_sniff():
    body = """<sitemapindex>
      <sitemap><loc>https://e.com/s1.xml</loc><lastmod>2020-01-01T00:00:00Z</lastmod></sitemap>
      <sitemap><loc>::invalid::</loc></sitemap>
    </sitemapindex>"""
    assert S.sniff_sitemap(body) == "index"
    assert S.sniff_sitemap(URLSET) == "urlset"
    assert S.sniff_sitemap("https://e.com/a\n") == "unknown"
    r = S.parse_index(body)
    assert r.kind == "index"
    assert [i["loc"] for i in r.indexes] == ["https://e.com/s1.xml"]


def test_case_handling():
    # record tags case-insensitive; field path exact-case (inner.rs:83 vs
    # entry.rs:107-113)
    body = "<URLSET><URL><loc>https://e.com/a</loc></URL></URLSET>"
    assert S.parse_sitemap(body).entries == []  # <URL> pushes 'URL', path mismatch
    body = "<urlset><url><LOC>https://e.com/a</LOC></url></urlset>"
    assert S.parse_sitemap(body).entries == []  # exact-case field tags
    body = "<urlset><url><loc>https://e.com/a</loc></url></urlset>"
    assert [e["loc"] for e in S.parse_sitemap(body).entries] == ["https://e.com/a"]


def test_self_closing_and_entities():
    body = ("<urlset><url/><url><loc>https://e.com/a?x=1&amp;y=2</loc></url></urlset>")
    r = S.parse_urlset(body)
    assert [e["loc"] for e in r.entries] == ["https://e.com/a?x=1&y=2"]


def test_parse_txt_skips_invalid_lines():
    body = "https://e.com/a\nnot a url\nhttps://e.com/b\n"
    r = S.parse_txt(body)
    assert [e["loc"] for e in r.entries] == ["https://e.com/a", "https://e.com/b"]


def test_record_limit():
    body = "<urlset>" + "".join(
        f"<url><loc>https://e.com/{i}</loc></url>" for i in range(50_001)
    ) + "</urlset>"
    r = S.parse_urlset(body)
    assert r.error == S.ERR_RECORD_LIMIT
    # the 50,000th record's fields are never read (limit check precedes the
    # event), so 49,999 complete records are emitted — parse/mod.rs:44-57
    assert len(r.entries) == 49_999


def test_expand_depth_one():
    # nested sitemap-index ignored (auto.rs:190-192); errors skipped
    bodies = {
        "https://e.com/root.xml":
            "<sitemapindex><sitemap><loc>https://e.com/child.xml</loc></sitemap>"
            "<sitemap><loc>https://e.com/nested.xml</loc></sitemap>"
            "<sitemap><loc>https://e.com/missing.xml</loc></sitemap></sitemapindex>",
        "https://e.com/child.xml":
            "<urlset><url><loc>https://e.com/page1</loc></url></urlset>",
        "https://e.com/nested.xml":
            "<sitemapindex><sitemap><loc>https://e.com/deep.xml</loc></sitemap></sitemapindex>",
        "https://e.com/deep.xml":
            "<urlset><url><loc>https://e.com/deep-page</loc></url></urlset>",
        "https://e.com/plain.txt": "https://e.com/page2\n",
    }
    entries, stats = S.expand_sitemaps(
        ["https://e.com/root.xml", "https://e.com/plain.txt"], bodies.get)
    locs = sorted(e["loc"] for e in entries)
    assert locs == ["https://e.com/page1", "https://e.com/page2"]
    assert stats["nested_ignored"] == 1
    assert stats["skipped"] == 1  # missing.xml


# --- record scalars ---------------------------------------------------------


def test_priority_frequency_lastmod():
    assert parse_priority("0.6") == 0.6
    assert parse_priority("1.7") is None and parse_priority("x") is None
    assert parse_priority("nan") is None
    assert parse_frequency(" Daily ") == "daily"
    assert parse_frequency("sometimes") is None
    d0 = dt.datetime(2022, 9, 12, 12, 0, tzinfo=dt.timezone.utc)
    # frequency.rs:61-68 doctest: monthly +30 days
    assert next_date("monthly", d0) == d0 + dt.timedelta(days=30)
    assert next_date("always", d0) is None
    assert is_outdated("always", d0, d0) is True
    assert is_outdated("never", d0, d0) is False
    assert is_outdated("monthly", d0, d0 + dt.timedelta(days=30)) is True
    assert parse_lastmod("2022-09-08T10:43:13.000-04:00") == dt.datetime(
        2022, 9, 8, 14, 43, 13, tzinfo=dt.timezone.utc)
    assert parse_lastmod("garbage") is None
    assert format_lastmod(dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)) == \
        "2020-01-01T00:00:00.00Z"


# --- builders (S10-S14) -----------------------------------------------------


def test_entry_builder_round_trip():
    b = EntryBuilder()
    b.write("https://example.com/", lastmod=dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc),
            priority=1.0, frequency=None) if False else None
    b.write("https://example.com/",
            lastmod=dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc),
            priority=1.0, changefreq="daily")
    b.write("https://example.com/a&b")
    xml = b.close()
    assert xml.startswith("﻿<?xml")
    assert "<priority>1.0</priority>" in xml
    assert "<lastmod>2020-01-01T00:00:00.00Z</lastmod>" in xml
    assert "&amp;" in xml
    r = S.parse_urlset(xml)
    assert [e["loc"] for e in r.entries] == ["https://example.com/",
                                             "https://example.com/a&b"]
    assert r.entries[0]["priority"] == 1.0
    assert r.entries[0]["changefreq"] == "daily"


def test_index_and_plain_builders():
    b = IndexBuilder()
    b.write("https://e.com/s1.xml")
    r = S.parse_index(b.close())
    assert [i["loc"] for i in r.indexes] == ["https://e.com/s1.xml"]

    p = PlainBuilder()
    p.write("https://e.com/a")
    p.write("https://e.com/b")
    assert S.parse_txt(p.close()).entries[1]["loc"] == "https://e.com/b"


def test_robots_builder_round_trip():
    rb = (RobotsBuilder()
          .with_header("Robots.txt: Start")
          .group(["foobot"], lambda g: g.crawl_delay(5)
                 .allow("/example/yeah.txt").disallow("/example/nope.txt"))
          .group(["barbot", "nombot"], lambda g: g.disallow("/"))
          .sitemap("https://example.com/s.xml")
          .with_footer("End"))
    txt = rb.render()
    assert txt.startswith("# Robots.txt: Start")
    r = rb.parse("foobot")
    assert r.crawl_delay == 5.0
    assert r.is_allowed("/example/yeah.txt") is True
    assert r.is_allowed("/example/nope.txt") is False
    assert list(r.sitemaps) == ["https://example.com/s.xml"]
    r2 = rb.parse("nombot")
    assert r2.is_allowed("/anything") is False
