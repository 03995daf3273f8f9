"""Sitemap (URL-inclusion protocol) parsing kernel — operators S5-S9.

Pure-Python event-based XML sitemap parsing mirroring the reference's
``sitemapo`` crate:

* limits before every event:  inclusion/parse/mod.rs:44-57
* path-stack field dispatch:  inclusion/parse/inner.rs:61-108,
                              inclusion/parse/entry.rs:100-115 (urlset),
                              inclusion/parse/index.rs:75-86 (sitemapindex)
* record emitted on closing tag (and EOF) only when <loc> parsed:
                              inclusion/parse/entry.rs:18-29, inner.rs:90-103
* type sniffer:               inclusion/parse/auto.rs:22-33 (root tag,
                              case-insensitive)
* txt sitemap:                inclusion/parse/plain.rs:62-99 (every line
                              counts as a record; invalid lines skipped)
* depth<=1 auto expansion:    inclusion/parse/auto.rs:169-211 (nested
                              sitemap-index records ignored; failed sitemaps
                              silently skipped)

Parity notes:
* Record/field tag names: the record tag (<url>/<sitemap>) matches
  case-insensitively (inner.rs:83,97 eq_ignore_ascii_case); the *field* path
  comparison is exact/case-sensitive (entry.rs:107-113 byte equality), so
  `<LOC>` inside `<url>` is ignored.  Reproduced here.
* `<url/>` (Event::Empty) creates no record (inner.rs write_event ignores
  empty events).  Reproduced: self-closing tags are skipped entirely.
* The reference's AutoParser has two latent bugs we do NOT reproduce: the
  entry/index branches drop `self.plain` instead of themselves
  (auto.rs:183,190-192,204 — an exhausted entry parser loops forever), and
  Scanner loops forever on non-XML bodies (auto.rs:57-64 has no EOF arm;
  plain-text detection is a TODO at auto.rs:9).  We implement the documented
  intent: exhausted parsers are dropped, non-XML bodies are tried as txt
  sitemaps and skipped if they yield nothing.
* Byte limit is checked against the event's starting byte offset; quick-xml
  counts reader bytes consumed, which for in-memory parsing is equivalent at
  the granularity the tests exercise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

from .records import BYTE_LIMIT, RECORD_LIMIT, parse_frequency, parse_lastmod, parse_priority
from .urls import parse_url_str

URL_SET, URL = "urlset", "url"
SITEMAP_INDEX, SITEMAP = "sitemapindex", "sitemap"
LOCATION, LAST_MODIFIED, CHANGE_FREQUENCY, PRIORITY = (
    "loc", "lastmod", "changefreq", "priority",
)

_TAG_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<\?.*?\?>|<![^>]*>|<[^>]*>", re.DOTALL
)
_UNESCAPE = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&apos;": "'", "&quot;": '"'}
_ENTITY_RE = re.compile(r"&(?:amp|lt|gt|apos|quot|#x?[0-9A-Fa-f]+);")


def _unescape(text: str) -> str:
    def sub(m: re.Match) -> str:
        e = m.group(0)
        if e in _UNESCAPE:
            return _UNESCAPE[e]
        try:
            if e[2] in "xX":
                return chr(int(e[3:-1], 16))
            return chr(int(e[2:-1]))
        except ValueError:
            return e

    return _ENTITY_RE.sub(sub, text)


# --- event scan -------------------------------------------------------------


def _events(body: str) -> Iterable[tuple[str, str, int]]:
    """Yield ('start'|'end'|'text', payload, byte_offset) XML events."""
    pos = 0
    for m in _TAG_RE.finditer(body):
        if m.start() > pos:
            text = body[pos : m.start()]
            if text.strip():
                yield ("text", _unescape(text.strip()), pos)
        tag = m.group(0)
        pos = m.end()
        if tag.startswith(("<!--", "<![CDATA[", "<?", "<!")):
            continue
        inner = tag[1:-1].strip()
        if not inner:
            continue
        if inner.startswith("/"):
            yield ("end", inner[1:].strip().split()[0] if inner[1:].strip() else "", m.start())
        elif inner.endswith("/"):
            continue  # Event::Empty -> ignored (inner.rs write_event)
        else:
            yield ("start", inner.split()[0], m.start())


ERR_RECORD_LIMIT = "record_limit"
ERR_BYTE_LIMIT = "byte_limit"


@dataclass
class SitemapResult:
    kind: str  # 'urlset' | 'index' | 'txt' | 'unknown'
    entries: list[dict] = field(default_factory=list)
    # entry dict: loc (canonical str), lastmod (datetime|None),
    #             changefreq (str|None), priority (float|None)
    indexes: list[dict] = field(default_factory=list)
    # index dict: loc, lastmod
    error: Optional[str] = None


def sniff_sitemap(body: str) -> str:
    """Root-tag sniff (inclusion/parse/auto.rs:22-33): first Start tag
    ``sitemapindex``/``urlset`` (case-insensitive) decides; anything else is
    treated as a txt candidate (see module parity notes)."""
    for ev, name, _ in _events(body):
        if ev == "start":
            low = name.lower()
            if low == SITEMAP_INDEX:
                return "index"
            if low == URL_SET:
                return "urlset"
            return "unknown"
    return "unknown"


def _parse_xml(body: str, root: str, record_tag: str, fields: dict[str, str]) -> SitemapResult:
    """Shared urlset/sitemapindex event loop (inclusion/parse/inner.rs:61-108).

    ``fields`` maps field tag -> record key.  The path stack is seeded with
    the canonical lowercase root, exactly as ``Scanner::create_xml``
    (auto.rs:35-49) does after consuming the real root tag.
    """
    kind = "urlset" if root == URL_SET else "index"
    result = SitemapResult(kind=kind)
    path: list[str] = [root]
    record: Optional[dict] = None
    records = 0
    saw_root = False

    for ev, payload, offset in _events(body):
        # limits checked before each event (inclusion/parse/mod.rs:44-57)
        if records + 1 > RECORD_LIMIT:
            result.error = ERR_RECORD_LIMIT
            break
        if offset > BYTE_LIMIT:
            result.error = ERR_BYTE_LIMIT
            break
        if ev == "start":
            if not saw_root and payload.lower() == root:
                saw_root = True
                continue  # the scanner consumed the root; stack pre-seeded
            if payload.lower() == record_tag:
                records += 1
                record = dict.fromkeys(fields.values())
            path.append(payload)
        elif ev == "text":
            # exact-case path comparison, as in entry.rs:107-113 ([urlset,
            # url, loc] byte equality) — `<URL>`/`<LOC>` fields are ignored.
            if record is not None and len(path) == 3 and path[0] == root:
                if path[1] == record_tag and path[2] in fields:
                    record[fields[path[2]]] = payload
        elif ev == "end":
            if path:
                path.pop()
            if payload.lower() == record_tag and record is not None:
                built = _build_record(record, kind)
                if built is not None:
                    (result.entries if kind == "urlset" else result.indexes).append(built)
                record = None
    # EOF with a pending record: the reference emits it (inner.rs:105-108
    # Event::Eof -> record.take()), so truncated documents keep their last
    # partially-closed record.
    if record is not None and result.error is None:
        built = _build_record(record, kind)
        if built is not None:
            (result.entries if kind == "urlset" else result.indexes).append(built)
    return result


def _build_record(raw: dict, kind: str) -> Optional[dict]:
    """EntryFactory/IndexFactory.build: loc must parse, other fields lenient
    (inclusion/parse/entry.rs:18-29,106-114, index.rs:80-84)."""
    loc = parse_url_str(raw.get("loc")) if raw.get("loc") else None
    if loc is None:
        return None
    out = {"loc": loc, "lastmod": parse_lastmod(raw["lastmod"]) if raw.get("lastmod") else None}
    if kind == "urlset":
        out["changefreq"] = parse_frequency(raw["changefreq"]) if raw.get("changefreq") else None
        out["priority"] = parse_priority(raw["priority"]) if raw.get("priority") else None
    return out


def parse_urlset(body: str) -> SitemapResult:
    """S5: XML urlset scan -> Entry rows (inclusion/parse/entry.rs)."""
    return _parse_xml(
        body, URL_SET, URL,
        {LOCATION: "loc", LAST_MODIFIED: "lastmod",
         CHANGE_FREQUENCY: "changefreq", PRIORITY: "priority"},
    )


def parse_index(body: str) -> SitemapResult:
    """S6: XML sitemap-index scan -> Index rows (inclusion/parse/index.rs)."""
    return _parse_xml(body, SITEMAP_INDEX, SITEMAP, {LOCATION: "loc", LAST_MODIFIED: "lastmod"})


def parse_txt(body: str) -> SitemapResult:
    """S7: txt sitemap, one URL per line (inclusion/parse/plain.rs:62-99).

    Every line consumes a record slot (records increments before URL
    validation); invalid lines are skipped; limits checked before each line.
    """
    result = SitemapResult(kind="txt")
    records = 0
    offset = 0
    for line in body.splitlines(keepends=True):
        if records + 1 > RECORD_LIMIT:
            result.error = ERR_RECORD_LIMIT
            break
        if offset > BYTE_LIMIT:
            result.error = ERR_BYTE_LIMIT
            break
        offset += len(line.encode("utf-8"))
        records += 1
        loc = parse_url_str(line)
        if loc is not None:
            result.entries.append({"loc": loc, "lastmod": None,
                                   "changefreq": None, "priority": None})
    return result


def parse_sitemap(body: str) -> SitemapResult:
    """S8 dispatch: sniff then parse with the matching parser."""
    kind = sniff_sitemap(body)
    if kind == "index":
        return parse_index(body)
    if kind == "urlset":
        return parse_urlset(body)
    return parse_txt(body)  # documented intent; see module parity notes


def expand_sitemaps(
    seeds: Iterable[str],
    fetch: Callable[[str], Optional[str]],
) -> tuple[list[dict], dict]:
    """S9: depth<=1 recursive auto-expansion (inclusion/parse/auto.rs:114-211).

    ``fetch`` maps a sitemap URL to its body (None = unreachable -> silently
    skipped, auto.rs:200-204).  An index record's child sitemap that sniffs
    as another index is ignored (auto.rs:190-192).  Returns (entries, stats).
    The Spark analog is the 2-round driver loop in
    ``kit_spark.operators.sitemap_expand``.
    """
    entries: list[dict] = []
    stats = {"fetched": 0, "skipped": 0, "children": 0, "nested_ignored": 0}
    for seed in seeds:
        body = fetch(seed)
        stats["fetched"] += 1
        if body is None:
            stats["skipped"] += 1
            continue
        result = parse_sitemap(body)
        entries.extend(result.entries)
        for index_rec in result.indexes:
            child_body = fetch(index_rec["loc"])
            stats["fetched"] += 1
            stats["children"] += 1
            if child_body is None:
                stats["skipped"] += 1
                continue
            child_kind = sniff_sitemap(child_body)
            if child_kind == "index":
                stats["nested_ignored"] += 1  # depth-1: auto.rs:190-192
                continue
            child = parse_urlset(child_body) if child_kind == "urlset" else parse_txt(child_body)
            entries.extend(child.entries)
    return entries, stats
