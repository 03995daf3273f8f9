"""URL parsing / canonicalization kernel (operator D1, P2, P3).

A WHATWG-flavoured URL canonicalizer mirroring the observable behavior of the
``url`` crate (servo/rust-url) as used throughout the reference
(exclusion/parse/parser.rs:114-120, exclusion/paths/create.rs:15-37,
inclusion/parse/entry.rs:108, inclusion/parse/plain.rs:78-81): lenient parse
(invalid -> None, never raise), scheme/host lowercasing, default-port
removal, dot-segment removal, percent-encoding of forbidden characters.

Scope notes (documented deviations from full WHATWG):
* Non-ASCII hosts are percent-decoded then punycoded via the ``idna``
  package's UTS-46 processing (non-transitional, STD3 rules off) —
  the same configuration as ``url::Url``'s ``domain_to_ascii`` (the
  rust-url/idna crates implement WHATWG's non-transitional UTS-46), so
  deviation code points now agree too (``faß.de`` -> ``xn--fa-hia.de``,
  not IDNA-2003's ``fass.de``).  If the package is absent the stdlib
  IDNA-2003 codec is the fallback (divergent only on those mapped code
  points).  Hosts the mapping rejects return None.  Non-ASCII in
  path/query/fragment is percent-encoded as UTF-8, matching rust-url.
* Existing ``%XX`` sequences are preserved byte-for-byte (rust-url does not
  re-normalize their hex case); a lone ``%`` is also preserved, as in WHATWG.

This module is the inner kernel of the vectorized canonicalize UDF
(``kit_spark.functions.canon``) and of the oracle crawler.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

try:  # UTS-46 host mapping, matching rust-url's domain_to_ascii
    import idna as _idna
except ImportError:  # pragma: no cover - baked into this environment
    _idna = None

DEFAULT_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}
SPECIAL_SCHEMES = set(DEFAULT_PORTS)

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):(.*)$", re.DOTALL)
_HOST_OK_RE = re.compile(r"^[A-Za-z0-9._\-]+$|^\[[0-9A-Fa-f:.]+\]$")

# WHATWG percent-encode sets (per component).  '%' is never re-encoded.
_PATH_ENCODE = set(range(0x20)) | {0x7F, ord(" "), ord('"'), ord("<"), ord(">"),
                                   ord("`"), ord("{"), ord("}"), ord("#"), ord("?")}
_QUERY_ENCODE = set(range(0x20)) | {0x7F, ord(" "), ord('"'), ord("<"), ord(">"),
                                    ord("#")}
_FRAGMENT_ENCODE = set(range(0x20)) | {0x7F, ord(" "), ord('"'), ord("<"),
                                       ord(">"), ord("`")}
_USERINFO_ENCODE = _PATH_ENCODE | {ord("/"), ord(":"), ord(";"), ord("="),
                                   ord("@"), ord("["), ord("\\"), ord("]"),
                                   ord("^"), ord("|")}
_HEX = "0123456789ABCDEF"


_PCT_SEQ = re.compile(r"%([0-9A-Fa-f]{2})")


def _decode_host(host: str) -> Optional[str]:
    """WHATWG host preprocessing: percent-decode, then IDNA-to-ASCII.

    All-or-nothing: a stray ``%`` that is not a valid escape is a forbidden
    host code point after decoding (WHATWG host parser), and a host the
    ``idna`` codec cannot represent is invalid -> None.
    """
    if "%" in host:
        out = bytearray()
        i, n = 0, len(host)
        while i < n:
            ch = host[i]
            if ch == "%":
                m = _PCT_SEQ.match(host, i)
                if not m:
                    return None
                out.append(int(m.group(1), 16))
                i += 3
            else:
                out.extend(ch.encode("utf-8"))
                i += 1
        try:
            host = out.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if not host.isascii():
        # WHATWG keeps a single trailing root dot; the mappers reject the
        # empty label, so split it off around the conversion
        trailing = host.endswith(".") and not host.endswith("..")
        core = host[:-1] if trailing else host
        if _idna is not None:
            try:
                # rust-url's domain_to_ascii configuration: UTS-46,
                # non-transitional, STD3 ASCII rules off (beStrict=false)
                core = _idna.encode(core, uts46=True, std3_rules=False,
                                    transitional=False).decode("ascii")
            except _idna.IDNAError:
                return None
        else:  # stdlib IDNA-2003 fallback (documented divergence)
            try:
                core = core.encode("idna").decode("ascii")
            except UnicodeError:
                return None
        host = core + "." if trailing else core
    return host


def _pct_encode(text: str, encode_set: set[int]) -> str:
    out = []
    for b in text.encode("utf-8"):
        if b >= 0x80 or b in encode_set:
            out.append("%" + _HEX[b >> 4] + _HEX[b & 15])
        else:
            out.append(chr(b))
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal on an absolute path."""
    output: list[str] = []
    for seg in path.split("/"):
        if seg == "." or seg == "%2e" or seg == "%2E":
            # WHATWG treats %2e as '.' in path segments
            if not output:
                output.append("")
            continue
        low = seg.replace("%2e", ".").replace("%2E", ".")
        if low == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # a trailing '.' or '..' leaves a trailing slash
    if path.endswith(("/.", "/..", "/%2e", "/%2E", "/%2e%2e")) and (
        not output or output[-1] != ""
    ):
        output.append("")
    result = "/".join(output)
    if not result.startswith("/"):
        result = "/" + result
    return result


@dataclass(frozen=True)
class ParsedUrl:
    scheme: str
    username: str
    password: Optional[str]
    host: str
    port: Optional[int]  # None when absent or default for the scheme
    path: str
    query: Optional[str]
    fragment: Optional[str]

    def canonical(self) -> str:
        auth = ""
        if self.username or self.password is not None:
            auth = self.username
            if self.password is not None:
                auth += ":" + self.password
            auth += "@"
        port = f":{self.port}" if self.port is not None else ""
        query = f"?{self.query}" if self.query is not None else ""
        frag = f"#{self.fragment}" if self.fragment is not None else ""
        return f"{self.scheme}://{auth}{self.host}{port}{self.path}{query}{frag}"

    def match_path(self) -> str:
        """Relative match-path: path + ?query + #fragment, the form fed to the
        robots gate (exclusion/parse/mod.rs:243-258)."""
        query = f"?{self.query}" if self.query is not None else ""
        frag = f"#{self.fragment}" if self.fragment is not None else ""
        return self.path + query + frag


def parse_url(url: str) -> Optional[ParsedUrl]:
    """Lenient WHATWG-ish parse; returns None for anything invalid."""
    if url is None:
        return None
    # WHATWG: strip C0 controls and spaces at both ends; remove tab/newline.
    url = url.strip(" \t\n\r\f\v\x00\x01\x02\x03\x04\x05\x06\x07\x08\x0e\x0f"
                    "\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a\x1b\x1c\x1d"
                    "\x1e\x1f")
    url = url.replace("\t", "").replace("\n", "").replace("\r", "")
    m = _SCHEME_RE.match(url)
    if not m:
        return None
    scheme, rest = m.group(1).lower(), m.group(2)
    if scheme not in SPECIAL_SCHEMES:
        return None  # cannot-be-a-base / non-http(ish): rejected by engine
    # WHATWG special-scheme start: skip any run of leading (back)slashes,
    # then everything up to the next slash is the authority.
    rest = re.sub(r"^[/\\]*", "", rest)
    # split off fragment, then query
    frag: Optional[str] = None
    if "#" in rest:
        rest, frag = rest.split("#", 1)
        frag = _pct_encode(frag, _FRAGMENT_ENCODE)
    query: Optional[str] = None
    if "?" in rest:
        rest, query = rest.split("?", 1)
        query = _pct_encode(query, _QUERY_ENCODE)
    # authority [userinfo@]host[:port] up to first / or \
    sep = re.search(r"[/\\]", rest)
    if sep:
        authority, path = rest[: sep.start()], rest[sep.start():]
    else:
        authority, path = rest, ""
    username, password = "", None
    if "@" in authority:
        userinfo, authority = authority.rsplit("@", 1)
        if ":" in userinfo:
            username, pw = userinfo.split(":", 1)
            password = _pct_encode(pw, _USERINFO_ENCODE) or None
        else:
            username = userinfo
        username = _pct_encode(username, _USERINFO_ENCODE)
        if password == "":
            password = None
    host, port = authority, None
    if host.startswith("["):  # IPv6
        end = host.find("]")
        if end == -1:
            return None
        if len(host) > end + 1:
            if host[end + 1] != ":":
                return None
            port_s = host[end + 2:]
            host = host[: end + 1]
            if port_s:
                if not port_s.isdigit():
                    return None
                port = int(port_s)
        else:
            host = host
    elif ":" in host:
        host, port_s = host.rsplit(":", 1)
        if port_s:
            if not port_s.isdigit():
                return None
            port = int(port_s)
            if port > 65535:
                return None
    if not host:
        return None
    if "%" in host or not host.isascii():
        host = _decode_host(host)  # percent-decode + IDNA punycode
        if host is None:
            return None
    host = host.lower().rstrip(".")  # trailing-dot FQDN normalization
    if not host or not _HOST_OK_RE.match(host):
        return None  # forbidden host characters
    if port is not None and port == DEFAULT_PORTS.get(scheme):
        port = None
    # path: backslash -> slash (special schemes), encode, remove dot segments
    path = path.replace("\\", "/")
    path = _pct_encode(path, _PATH_ENCODE)
    path = _remove_dot_segments(path) if path else "/"
    return ParsedUrl(scheme, username, password, host, port, path, query, frag)


def parse_url_str(url: str) -> Optional[str]:
    """Parse-and-canonicalize; None if invalid.  The engine's url_canon."""
    parsed = parse_url(url)
    return parsed.canonical() if parsed else None


def create_robots_url(url: str) -> Optional[str]:
    """URL of the robots.txt governing ``url`` (exclusion/paths/create.rs:15-37).

    Strips credentials, rejects non-http(s) schemes, joins "/robots.txt".
    """
    parsed = parse_url(url)
    if parsed is None or parsed.scheme not in ("http", "https"):
        return None
    port = f":{parsed.port}" if parsed.port is not None else ""
    return f"{parsed.scheme}://{parsed.host}{port}/robots.txt"


def url_host_key(url: str) -> Optional[str]:
    """Politeness key: scheme://host:effective_port (one queue per authority)."""
    parsed = parse_url(url)
    if parsed is None:
        return None
    port = parsed.port if parsed.port is not None else DEFAULT_PORTS.get(parsed.scheme)
    return f"{parsed.scheme}://{parsed.host}:{port}"
