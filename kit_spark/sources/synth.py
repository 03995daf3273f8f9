"""Deterministic synthetic web + image-table synthesis (FIXTURES.md §1-§7).

Everything is seeded — no wall clock, no external data.  The same generator
feeds the oracle crawler (plain dicts), the Spark engine (DataFrames built
from these rows), and the benchmark (scaled row counts).

Host populations follow a Zipf-ish distribution (FIXTURES.md §2: one
mega-host) to exercise skew handling; robots bodies exercise the lexer
misspelling table, wildcard rules, crawl-delays, and access states; sitemap
docs exercise urlset/index/txt/garbage plus the nested-index-ignored rule.
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass, field

from kit_spark.kit_py import codec
from kit_spark.kit_py.builders import EntryBuilder, IndexBuilder
from kit_spark.kit_py.crawler import SyntheticWeb

FMTS = (codec.FMT_LOSSLESS, codec.FMT_LOSSY)

_CAPTION_COLORS = ("red", "blue", "green", "golden", "silver", "matte black")
_CAPTION_NOUNS = ("fox", "tram", "lighthouse", "teapot", "bridge", "violin")
_CAPTION_SURFACES = ("a wooden table", "wet asphalt", "a snowy hill",
                     "a linen cloth", "a rooftop", "sand dunes")


def caption_for(image_id: str) -> str:
    """Caption as a pure function of image_id — any executor (and the fetch
    verifier, D7) can recompute it without shared RNG state."""
    h = zlib.crc32(image_id.encode("utf-8"))
    return (f"a {_CAPTION_COLORS[h % 6]} {_CAPTION_NOUNS[(h >> 3) % 6]} "
            f"on {_CAPTION_SURFACES[(h >> 6) % 6]}")


def image_spec(image_id: str, img_min: int = 24, img_max: int = 56) -> dict:
    """(w, h, fmt, caption) as pure functions of image_id — the basis of
    distributed image-table synthesis (mapInPandas over spark.range)."""
    h = zlib.crc32(("spec:" + image_id).encode("utf-8"))
    span = img_max - img_min
    return {
        "image_id": image_id,
        "w": img_min + (h % span),
        "h": img_min + ((h >> 8) % span),
        "fmt": FMTS[(h >> 16) % 2],
        "caption": caption_for(image_id),
    }


@dataclass
class WebFixture:
    seeds: list[str] = field(default_factory=list)
    web: SyntheticWeb = field(default_factory=SyntheticWeb)
    # page url_canon -> (image_id, fmt)
    pages: dict[str, tuple[str, str]] = field(default_factory=dict)
    image_meta: list[dict] = field(default_factory=list)  # without bytes

    def image_rows(self, with_bytes: bool = True) -> list[dict]:
        """Rows of the BASELINE.json:15 input table
        (image_id, bytes, w, h, fmt, caption, phash)."""
        rows = []
        for meta in self.image_meta:
            row = dict(meta)
            pixels = codec.synth_pixels(meta["image_id"], meta["w"], meta["h"])
            if with_bytes:
                row["bytes"] = codec.encode_image(pixels, meta["fmt"])
            row["phash"] = codec.phash64(pixels)
            rows.append(row)
        return rows


def _zipf_pages(rng: random.Random, n_hosts: int, total_pages: int) -> list[int]:
    """Zipf(s~1.2) page counts over hosts: host 0 is the mega-host."""
    weights = [1.0 / (k + 1) ** 1.2 for k in range(n_hosts)]
    scale = total_pages / sum(weights)
    counts = [max(1, int(w * scale)) for w in weights]
    return counts


def synth_web(seed: int = 42, n_hosts: int = 8, total_pages: int = 240,
              img_min: int = 24, img_max: int = 56) -> WebFixture:
    rng = random.Random(seed)
    fx = WebFixture()
    counts = _zipf_pages(rng, n_hosts, total_pages)
    img_idx = 0

    for k in range(n_hosts):
        host = f"h{k}.example.com"
        base = f"https://{host}"
        host_key = f"https://{host}:443"
        page_urls: list[str] = []
        for _ in range(counts[k]):
            image_id = f"img{img_idx:010d}"
            img_idx += 1
            spec = image_spec(image_id, img_min, img_max)
            url = f"{base}/img/{image_id}.{spec['fmt']}"
            page_urls.append(url)
            fx.pages[url] = (image_id, spec["fmt"])
            fx.image_meta.append(spec)
        # a few blocked pages per host
        blocked = [f"{base}/private/p{i}.html" for i in range(3)]

        # --- robots.txt (access-state mix, S1-S4) ---------------------------
        roll = rng.random()
        if roll < 0.70:
            body = _robots_body(rng, host, base)
            fx.web.robots[host_key] = ("successful", body.encode("utf-8"))
        elif roll < 0.80:
            fx.web.robots[host_key] = ("redirect", None)
        elif roll < 0.90:
            fx.web.robots[host_key] = ("unavailable", None)
        else:
            fx.web.robots[host_key] = ("unreachable", None)

        # --- sitemaps (only referenced when robots was successful) ----------
        if fx.web.robots[host_key][0] == "successful":
            _attach_sitemaps(rng, fx, base, page_urls)

        # --- link graph: chain + random cross/dup/messy edges ---------------
        all_targets = page_urls + blocked
        for i, url in enumerate(page_urls):
            out: list[str] = []
            if i + 1 < len(page_urls):
                out.append(page_urls[i + 1])
            if rng.random() < 0.4:
                out.append(rng.choice(all_targets))
            if rng.random() < 0.25 and k + 1 < n_hosts:
                out.append(f"https://h{(k + 1) % n_hosts}.example.com/img/"
                           f"img{rng.randrange(img_idx):010d}.png")
            if rng.random() < 0.3:  # messy raw forms exercising D1
                messy = rng.choice([
                    url.replace("https://h", "https://H").replace("example", "EXAMPLE"),
                    url.replace(".com/", ".com:443/"),
                    url.replace("/img/", "/img/../img/"),
                    " " + url + " ",
                ])
                out.append(messy)
            if rng.random() < 0.15:
                out.append("not a url at all")
            fx.web.links[url] = out

        # seeds: ~2 pages per host (first + random)
        fx.seeds.append(page_urls[0])
        if len(page_urls) > 2:
            fx.seeds.append(rng.choice(page_urls[1:]))
        if blocked:
            fx.seeds.append(blocked[0])  # exercises the robots gate on seeds
    return fx


def _robots_body(rng: random.Random, host: str, base: str) -> str:
    """Robots bodies mixing canonical and misspelled directives, wildcard
    rules, crawl-delays, UA groups, comments (FIXTURES.md §3)."""
    disallow_kw = rng.choice(["Disallow", "dissallow", "disalow", "DISALLOW"])
    delay_kw = rng.choice(["Crawl-delay", "crawl delay", "crawldelay"])
    delay = rng.choice([None, 1, 2, 5, 0.5, 15])
    lines = ["# synthetic robots fixture", "User-Agent: *"]
    lines.append(f"{disallow_kw}: /private/")
    if rng.random() < 0.5:
        lines.append(f"{disallow_kw}: /*.tmp$")
    if rng.random() < 0.3:
        lines.append("Allow: /private/open.html")
    if delay is not None:
        lines.append(f"{delay_kw}: {delay}")
    if rng.random() < 0.3:  # a specific bot group the engine does not use
        lines += ["", "User-Agent: otherbot", "Disallow: /"]
    return "\n".join(lines) + "\n"


def _attach_sitemaps(rng: random.Random, fx: WebFixture, base: str,
                     page_urls: list[str]) -> None:
    """Attach a urlset / txt / index(+children, +nested-ignored) sitemap and
    reference it from the robots body (Sitemap lines are global, L3)."""
    host_key = base.replace("https://", "https://").split("//")[1]
    host_key = f"https://{host_key}:443"
    kind = rng.choice(["urlset", "txt", "index", "none"])
    if kind == "none":
        return
    sitemap_url = f"{base}/sitemap.xml" if kind != "txt" else f"{base}/sitemap.txt"
    sample = page_urls[: max(1, len(page_urls) // 2)]
    if kind == "urlset":
        b = EntryBuilder()
        for u in sample:
            pri = rng.choice([None, 0.2, 0.5, 0.8, 1.0])
            freq = rng.choice([None, "daily", "weekly", "never"])
            b.write(u, priority=pri, changefreq=freq)
        fx.web.sitemap_bodies[sitemap_url] = b.close()
    elif kind == "txt":
        fx.web.sitemap_bodies[sitemap_url] = "\n".join(sample + ["garbage line"]) + "\n"
    elif kind == "index":
        child1 = f"{base}/sm-child1.xml"
        nested = f"{base}/sm-nested.xml"  # sniffs as index -> must be ignored
        ib = IndexBuilder()
        ib.write(child1)
        ib.write(nested)
        ib.write(f"{base}/sm-missing.xml")  # fetch fails -> skipped
        fx.web.sitemap_bodies[sitemap_url] = ib.close()
        cb = EntryBuilder()
        for u in sample:
            cb.write(u, priority=0.8)
        fx.web.sitemap_bodies[child1] = cb.close()
        nb = IndexBuilder()
        nb.write(f"{base}/sm-deep.xml")
        fx.web.sitemap_bodies[nested] = nb.close()
    access, body = fx.web.robots[host_key]
    fx.web.robots[host_key] = (
        access, body + f"Sitemap: {sitemap_url}\n".encode("utf-8"))
