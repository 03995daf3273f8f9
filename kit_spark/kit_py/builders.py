"""Sitemap & robots.txt sinks (operators S10-S14) — golden-output builders.

String-level reimplementation of the reference's writers; used for fixture
generation and round-trip property tests, and as the per-file kernel of the
distributed sitemap sinks (``kit_spark.operators``'s write paths, which split
record streams into <=50,000-row / <=50 MiB files before rendering).

* XML open/close + BOM + decl:  inclusion/build/inner.rs:46-74
* <url> element rendering:      inclusion/build/entry.rs:77-156
  (field order: loc, lastmod, priority, changefreq — note priority BEFORE
  changefreq, unlike the parse-side document order)
* <sitemap> element rendering:  inclusion/build/index.rs:73-156
* txt sink + running byte cap:  inclusion/build/plain.rs:57-101
* robots.txt builder:           exclusion/build/mod.rs:15-117, group.rs,
                                split.rs:2-15
* The reference's AutoBuilder is an unimplemented stub (todo!() at
  inclusion/build/auto.rs:25-55); our file-splitting sinks supersede it.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field as dc_field
from typing import Optional

from .records import (BYTE_LIMIT, RECORD_LIMIT, URL_LEN_LIMIT, format_lastmod,
                      format_priority)
from .robots import normalize_path

XMLNS = "http://www.sitemaps.org/schemas/sitemap/0.9"
_BOM = "﻿"
_DECL = '<?xml version="1.0" encoding="UTF-8"?>'


class SinkLimitError(ValueError):
    """Record/byte limit exceeded (inclusion/build/entry.rs:78-80,113-116)."""


def _escape_xml(text: str) -> str:
    """quick-xml escapes & < > " ' when writing text content."""
    return (text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;").replace("'", "&apos;"))


class EntryBuilder:
    """S10: XML urlset sink (inclusion/build/entry.rs:73-156)."""

    root = "urlset"

    def __init__(self) -> None:
        self.parts = [_BOM, _DECL, f'<{self.root} xmlns="{XMLNS}">']
        self.records = 0

    def write(self, loc: str, lastmod: Optional[dt.datetime] = None,
              priority: Optional[float] = None,
              changefreq: Optional[str] = None) -> None:
        if self.records + 1 > RECORD_LIMIT:
            raise SinkLimitError("record limit")
        element = [f"<url><loc>{_escape_xml(loc)}</loc>"]
        if lastmod is not None:
            element.append(f"<lastmod>{format_lastmod(lastmod)}</lastmod>")
        if priority is not None:
            element.append(f"<priority>{format_priority(priority)}</priority>")
        if changefreq is not None:
            element.append(f"<changefreq>{changefreq}</changefreq>")
        element.append("</url>")
        rendered = "".join(element)
        if len(rendered.encode("utf-8")) > BYTE_LIMIT:
            raise SinkLimitError("byte limit")
        self.parts.append(rendered)
        self.records += 1

    def close(self) -> str:
        return "".join(self.parts) + f"</{self.root}>"


class IndexBuilder:
    """S11: XML sitemapindex sink (inclusion/build/index.rs:73-156)."""

    root = "sitemapindex"

    def __init__(self) -> None:
        self.parts = [_BOM, _DECL, f'<{self.root} xmlns="{XMLNS}">']
        self.records = 0

    def write(self, loc: str, lastmod: Optional[dt.datetime] = None) -> None:
        if self.records + 1 > RECORD_LIMIT:
            raise SinkLimitError("record limit")
        element = [f"<sitemap><loc>{_escape_xml(loc)}</loc>"]
        if lastmod is not None:
            element.append(f"<lastmod>{format_lastmod(lastmod)}</lastmod>")
        element.append("</sitemap>")
        self.parts.append("".join(element))
        self.records += 1

    def close(self) -> str:
        return "".join(self.parts) + f"</{self.root}>"


class PlainBuilder:
    """S12: txt sink, URL + newline, running byte cap vs writer_bytes
    (inclusion/build/plain.rs:57-101).  Additionally enforces the
    URL_LEN_LIMIT newline-vulnerability guard that the reference declares
    (inclusion/record/mod.rs:19-22) but never wires up."""

    def __init__(self) -> None:
        self.lines: list[str] = []
        self.bytes = 0
        self.records = 0

    def write(self, loc: str) -> None:
        if self.records + 1 > RECORD_LIMIT:
            raise SinkLimitError("record limit")
        if len(loc) > URL_LEN_LIMIT or "\n" in loc or "\r" in loc:
            raise SinkLimitError("url length/newline guard")
        record = loc + "\n"
        if self.bytes + len(record.encode("utf-8")) > BYTE_LIMIT:
            raise SinkLimitError("byte limit")
        self.lines.append(record)
        self.bytes += len(record.encode("utf-8"))
        self.records += 1

    def close(self) -> str:
        return "".join(self.lines)


# --- robots.txt builder (S14) ----------------------------------------------


def format_comment(text: str) -> str:
    """Split multiline comments, prefix with '# ' (exclusion/build/split.rs:2-15)."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        out.append(line if line.startswith("#") else f"# {line}")
    return "\n".join(out)


@dataclass
class GroupBuilder:
    """One UA group (exclusion/build/group.rs:11-161).  Rules are
    normalize_path'd on insertion (group.rs:55-75)."""

    user_agents: list[str] = dc_field(default_factory=list)
    rules_allow: list[str] = dc_field(default_factory=list)
    rules_disallow: list[str] = dc_field(default_factory=list)
    delay: Optional[int] = None  # u16 seconds (group.rs:87-90)
    header: Optional[str] = None
    footer: Optional[str] = None

    def allow(self, rule: str) -> "GroupBuilder":
        self.rules_allow.append(normalize_path(rule))
        return self

    def disallow(self, rule: str) -> "GroupBuilder":
        self.rules_disallow.append(normalize_path(rule))
        return self

    def crawl_delay(self, delay: int) -> "GroupBuilder":
        self.delay = delay
        return self

    def render(self) -> str:
        parts = []
        if self.header:
            parts.append(format_comment(self.header))
        if self.user_agents:
            parts.append("\n".join(f"User-Agent: {ua.strip()}" for ua in self.user_agents))
        else:
            parts.append("User-Agent: *")  # group.rs:126-132
        if self.delay is not None:
            parts.append(f"Crawl-Delay: {self.delay}")
        if self.rules_disallow:
            parts.append("\n".join(f"Disallow: {r}" for r in self.rules_disallow))
        if self.rules_allow:
            parts.append("\n".join(f"Allow: {r}" for r in self.rules_allow))
        elif not self.rules_disallow:
            parts.append("Allow: *")  # group terminator (group.rs:142-149)
        if self.footer:
            parts.append(format_comment(self.footer))
        return "\n".join(parts)


@dataclass
class RobotsBuilder:
    """Declarative robots.txt writer (exclusion/build/mod.rs:15-117)."""

    groups: list[GroupBuilder] = dc_field(default_factory=list)
    sitemaps: list[str] = dc_field(default_factory=list)  # insertion-ordered dedup
    header: Optional[str] = None
    footer: Optional[str] = None

    def with_header(self, text: str) -> "RobotsBuilder":
        self.header = text
        return self

    def with_footer(self, text: str) -> "RobotsBuilder":
        self.footer = text
        return self

    def group(self, user_agents: list[str], configure) -> "RobotsBuilder":
        gb = GroupBuilder(user_agents=[ua.strip() for ua in user_agents])
        self.groups.append(configure(gb))
        return self

    def sitemap(self, url: str) -> "RobotsBuilder":
        if url not in self.sitemaps:  # HashSet dedup (build/mod.rs:72-75)
            self.sitemaps.append(url)
        return self

    def render(self) -> str:
        blocks = []
        if self.header:
            blocks.append(format_comment(self.header))
        blocks.append("\n\n".join(g.render() for g in self.groups))
        if self.sitemaps:
            # The reference *collects* sitemaps (build/mod.rs:72-75) but its
            # Display impl never renders them (build/mod.rs:104-117) — we do
            # render them (insertion-ordered for deterministic fixtures),
            # since a Sitemap line that can't be written can't round-trip.
            blocks[-1] = blocks[-1] + "\n" + "\n".join(
                f"Sitemap: {s}" for s in self.sitemaps
            )
        if self.footer:
            blocks.append(format_comment(self.footer))
        return "\n\n".join(b for b in blocks if b)

    def parse(self, user_agent: str):
        """Round-trip through the parser (exclusion/build/mod.rs:98-101)."""
        from .robots import Robots

        return Robots.from_bytes(self.render().encode("utf-8"), user_agent)
