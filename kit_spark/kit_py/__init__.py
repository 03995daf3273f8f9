"""kit_py — pure-Python semantic core of the PySpark crawl-frontier engine.

Dependency-free (numpy only for the image codec) reimplementation of the
*behavior* of spire-rs/kit: robots.txt exclusion semantics, sitemap inclusion
semantics, URL canonicalization, plus the deterministic reference crawler
used as the crawl-ordering oracle.  These functions are also the inner
kernels of the engine's vectorized pandas UDFs.
"""

from .robots import ALL_UAS, BYTE_LIMIT, Robots, Rule, normalize_path  # noqa: F401
from .urls import (create_robots_url, parse_url, parse_url_str,  # noqa: F401
                   url_host_key)
from .records import (RECORD_LIMIT, format_lastmod, parse_frequency,  # noqa: F401
                      parse_lastmod, parse_priority)
from .sitemaps import (expand_sitemaps, parse_index, parse_sitemap,  # noqa: F401
                       parse_txt, parse_urlset, sniff_sitemap)
from .crawler import CrawlConfig, CrawlResult, SyntheticWeb, crawl  # noqa: F401
