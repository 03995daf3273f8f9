"""D1: vectorized URL canonicalization (pandas/Arrow UDFs).

The kernel is ``kit_spark.kit_py.urls``; this module wraps it for Spark with
a vectorized fast path: the overwhelming majority of crawl URLs are already
canonical ASCII http(s) URLs, detected with one pandas ``str.fullmatch``
(C-level regex over the whole Arrow batch) and passed through untouched.
Only the messy minority (uppercase hosts, default ports, dot segments,
percent-encoding, userinfo, backslashes...) drops to the per-element kernel.

Output is a single struct column so one UDF invocation yields url_canon,
host_key and match_path together (one Arrow round-trip, not three).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

from kit_spark.kit_py.urls import DEFAULT_PORTS, parse_url

CANON_STRUCT = T.StructType([
    T.StructField("url_canon", T.StringType()),
    T.StructField("host_key", T.StringType()),
    T.StructField("match_path", T.StringType()),
])

# Already-canonical fast path: lowercase scheme+host, no default port, no
# userinfo, no %/\\ tricks, no dot segments, printable ASCII path/query.
_FAST_RE = (
    r"https?://"                                  # lowercase scheme
    r"[a-z0-9]([a-z0-9\-]*[a-z0-9])?"             # host label
    r"(\.[a-z0-9]([a-z0-9\-]*[a-z0-9])?)*"        # dotted labels
    r"(:[0-9]{1,5})?"                              # explicit port (checked below)
    r"/[!$&-.0-9;=A-Z_a-z~/]*"                     # path: safe ASCII, no % ? # \
    r"(\?[!$&-.0-9;=A-Z_a-z~/:]*)?"                # optional simple query
)


def canonical_series(urls: pd.Series) -> pd.Series:
    """pd.Series[str] -> canonical URL strings (None for invalid/non-http)."""
    urls = urls.astype("object")
    fast = urls.str.fullmatch(_FAST_RE, na=False)
    # fast-path exclusions that the regex can't see: default ports and
    # dot segments
    fast &= ~urls.str.contains(r"//[^/]*:(?:80|443)/", regex=True, na=False)
    fast &= ~urls.str.contains(r"//[^/]*:0", regex=True, na=False)  # 0-led port
    fast &= ~urls.str.contains(r"/\.\.?(?:/|$)", regex=True, na=False)

    canon = pd.Series(index=urls.index, dtype="object")
    canon[fast] = urls[fast]
    slow_mask = ~fast
    if slow_mask.any():
        # vectorized pre-normalization of the *common* messy shapes, then
        # re-test the fast path; only true stragglers pay per-element parse
        pre = urls[slow_mask].str.strip()
        # vectorized scheme+authority lowercase (skip userinfo URLs: WHATWG
        # preserves userinfo case, those go to the full parser)
        ext = pre.str.extract(r"^([A-Za-z]+://[^/@]*)((?:/.*)?)$")
        lowered = ext[0].str.lower() + ext[1].fillna("")
        pre = lowered.where(ext[0].notna(), pre)
        pre = pre.str.replace(r"^(https://[^/]*):443(/|$)", r"\1\2", regex=True)
        pre = pre.str.replace(r"^(http://[^/]*):80(/|$)", r"\1\2", regex=True)
        for _ in range(3):  # bounded dot-segment collapse
            collapsed = pre.str.replace(r"/[^/]+/\.\./", "/", regex=True) \
                           .str.replace(r"/\./", "/", regex=True)
            if collapsed.equals(pre):
                break
            pre = collapsed
        refast = pre.str.fullmatch(_FAST_RE, na=False)
        refast &= ~pre.str.contains(r"//[^/]*:(?:80|443)/", regex=True, na=False)
        refast &= ~pre.str.contains(r"//[^/]*:0", regex=True, na=False)
        refast &= ~pre.str.contains(r"/\.\.?(?:/|$)", regex=True, na=False)
        canon[pre.index[refast]] = pre[refast]
        rest = pre.index[~refast]
        if len(rest):
            canon[rest] = [_slow_canon(u) for u in urls[rest]]
    return canon


def canonicalize_batch(urls: pd.Series) -> pd.DataFrame:
    """pd.Series[str] -> DataFrame(url_canon, host_key, match_path).

    Invalid/non-http(s) URLs yield nulls in all three fields.
    """
    canon = canonical_series(urls)
    extracted = canon.str.extract(
        r"^(https?)://(?:[^/@]*@)?([^/:?#]+)(?::([0-9]+))?(/.*)?$")
    scheme, host, port, rest = (extracted[i] for i in range(4))
    eff_port = port.fillna(scheme.map(lambda s: str(DEFAULT_PORTS.get(s, ""))
                                      if isinstance(s, str) else None))
    host_key = scheme + "://" + host + ":" + eff_port
    match_path = rest.fillna("/")
    bad = canon.isna() | scheme.isna()
    host_key[bad] = None
    match_path[bad] = None
    return pd.DataFrame({
        "url_canon": canon.where(~bad, None),
        "host_key": host_key,
        "match_path": match_path,
    })


def _slow_canon(u) -> str | None:
    if not isinstance(u, str):
        return None
    parsed = parse_url(u)
    if parsed is None or parsed.scheme not in ("http", "https"):
        return None
    return parsed.canonical()


@F.pandas_udf(CANON_STRUCT)
def _canonicalize_udf_raw(urls: pd.Series) -> pd.DataFrame:
    return canonicalize_batch(urls)


@F.pandas_udf(T.StringType())
def _canon_url_udf_raw(urls: pd.Series) -> pd.Series:
    return canonical_series(urls)


# Both canon UDFs are marked non-deterministic (they are in fact pure) so
# the optimizer never duplicates them around a pushed-down filter: a
# filter or join condition on the UDF's *output* (isnotnull(url_canon),
# the robots-gate host_key equi-join) otherwise plants a second
# ArrowEvalPython below the filter and every row pays the kernel twice —
# the guide §4.4 pattern, observed as 2x canon nodes per branch in the
# round-6 before-plans (plans/r06/*_before.txt).  Callers that filter on
# *input* columns (doc_id slices) apply the filter before the UDF call,
# so no pushdown is lost.
canonicalize_udf = _canonicalize_udf_raw.asNondeterministic()

#: url_canon only — the admission hot path (host_key/match_path are
#: derived JVM-side after dedup, see derive_host_and_path).
canon_url_udf = _canon_url_udf_raw.asNondeterministic()


def with_canon(df, url_col: str = "url"):
    """Append url_canon/host_key/match_path columns (one UDF call)."""
    out = df.withColumn("__c", canonicalize_udf(F.col(url_col)))
    return (out.withColumn("url_canon", F.col("__c.url_canon"))
               .withColumn("host_key", F.col("__c.host_key"))
               .withColumn("match_path", F.col("__c.match_path"))
               .drop("__c"))


def derive_host_and_path(df, url_col: str = "url_canon"):
    """JVM-side (no UDF) host_key/match_path from an already-*canonical* URL.

    Equivalent to the canonicalize UDF's outputs for canonical forms; used
    after dedup so shuffles carry only (url_canon, priority) and the derived
    columns are recomputed cheaply by codegen instead of being shuffled.
    """
    url = F.col(url_col)
    proto = F.parse_url(url, F.lit("PROTOCOL"))
    host = F.parse_url(url, F.lit("HOST"))
    authority = F.parse_url(url, F.lit("AUTHORITY"))
    port = F.nullif(F.regexp_extract(authority, r":([0-9]+)$", 1), F.lit(""))
    eff_port = F.coalesce(port, F.when(proto == "https", F.lit("443"))
                          .otherwise(F.lit("80")))
    return (df.withColumn("host_key",
                          F.concat(proto, F.lit("://"), host, F.lit(":"),
                                   eff_port))
            .withColumn("match_path",
                        F.regexp_replace(url, r"^[a-z]+://[^/]*", "")))
