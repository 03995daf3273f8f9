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


def canonicalize_batch(urls: pd.Series) -> pd.DataFrame:
    """pd.Series[str] -> DataFrame(url_canon, host_key, match_path).

    Invalid/non-http(s) URLs yield nulls in all three fields.
    """
    urls = urls.astype("object")
    fast = urls.str.fullmatch(_FAST_RE, na=False)
    # fast-path exclusions that the regex can't see: default ports and
    # dot segments
    fast &= ~urls.str.contains(r"//[^/]*:(?:80|443)/", regex=True, na=False)
    fast &= ~urls.str.contains(r"//[^/]*:0", regex=True, na=False)  # 0-led port
    fast &= ~urls.str.contains(r"/\.\.?(?:/|$)", regex=True, na=False)

    canon = pd.Series(index=urls.index, dtype="object")
    canon[fast] = urls[fast]
    slow_idx = urls.index[~fast]
    if len(slow_idx):
        canon[slow_idx] = [
            _slow_canon(u) for u in urls[~fast]
        ]

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
def canonicalize_udf(urls: pd.Series) -> pd.DataFrame:
    return canonicalize_batch(urls)


def with_canon(df, url_col: str = "url"):
    """Append url_canon/host_key/match_path columns (one UDF call)."""
    out = df.withColumn("__c", canonicalize_udf(F.col(url_col)))
    return (out.withColumn("url_canon", F.col("__c.url_canon"))
               .withColumn("host_key", F.col("__c.host_key"))
               .withColumn("match_path", F.col("__c.match_path"))
               .drop("__c"))
