"""Golden-behavior tests for the robots.txt semantic core (kit_py.robots).

The match/precedence tables replicate the reference's inline test corpus —
which itself encodes Google's published robots.txt spec examples —
case-for-case:
* rule matching:      exclusion/parse/rule.rs:223-372 (mod matching)
* rule precedence:    exclusion/parse/inner.rs:194-239 (mod precedence_rules)
* UA group selection: exclusion/parse/inner.rs:241-306 (mod precedence_agents)
* optimal collapse:   exclusion/parse/inner.rs:151-191 (mod optimal_output)
* lexer behavior:     exclusion/parse/lexer.rs:201-227 (mod lexing)
"""

import pytest

from kit_spark.kit_py import robots as R
from kit_spark.kit_py.robots import ALL_UAS, Robots, Rule, WildcardError


def rule(pattern, allow=True):
    return Rule.new(pattern, allow)


# --- rule matching (rule.rs:223-372: Google spec examples) ------------------

MATCH_CASES = [
    # (pattern, path, expected)
    ("/", "/fish", True),                       # root_none
    ("/*", "/fish", True), ("/*", "//", True),  # root_universal
    ("/$", "/", True), ("/$", "/fish", False), ("/$", "//", False),
    ("/$", "/$", False),                        # root_ending
    # simple prefix /fish
    ("/fish", "/fish", True), ("/fish", "/fish.html", True),
    ("/fish", "/fish/salmon.html", True), ("/fish", "/fishheads", True),
    ("/fish", "/fishheads/yummy.html", True),
    ("/fish", "/fish.php?id=anything", True),
    ("/fish", "/Fish.asp", False), ("/fish", "/catfish", False),
    ("/fish", "/?id=fish", False), ("/fish", "/desert/fish", False),
    # folder /fish/
    ("/fish/", "/fish/", True), ("/fish/", "/fish/?id=anything", True),
    ("/fish/", "/fish/salmon.htm", True),
    ("/fish/", "/fish", False), ("/fish/", "/fish.html", False),
    ("/fish/", "/animals/fish/", False), ("/fish/", "/Fish/Salmon.asp", False),
    # universal_end /fish*
    ("/fish*", "/fish", True), ("/fish*", "/fish.html", True),
    ("/fish*", "/fish/salmon.html", True), ("/fish*", "/fishheads", True),
    ("/fish*", "/fishheads/yummy.html", True),
    ("/fish*", "/fish.php?id=anything", True),
    ("/fish*", "/Fish.asp", False), ("/fish*", "/catfish", False),
    ("/fish*", "/?id=fish", False), ("/fish*", "/desert/fish", False),
    # universal_mid /*.php
    ("/*.php", "/index.php", True), ("/*.php", "/filename.php", True),
    ("/*.php", "/folder/filename.php", True),
    ("/*.php", "/folder/filename.php?parameters", True),
    ("/*.php", "/folder/any.php.file.html", True),
    ("/*.php", "/filename.php/", True),
    ("/*.php", "/", False), ("/*.php", "/windows.PHP", False),
    # universal_mid2 /fish*.php
    ("/fish*.php", "/fish.php", True),
    ("/fish*.php", "/fishheads/catfish.php?parameters", True),
    ("/fish*.php", "/Fish.PHP", False),
    # both_wildcards /*.php$
    ("/*.php$", "/filename.php", True),
    ("/*.php$", "/folder/filename.php", True),
    ("/*.php$", "/filename.php?parameters", False),
    ("/*.php$", "/filename.php/", False),
    ("/*.php$", "/filename.php5", False),
    ("/*.php$", "/windows.PHP", False),
]


@pytest.mark.parametrize("pattern,path,expected", MATCH_CASES)
def test_rule_matching(pattern, path, expected):
    assert rule(pattern).is_match(R.normalize_path(path)) is expected


def test_wildcard_classification():
    # rule.rs:115-146 (mod wildcard)
    assert rule("/").kind == "prefix"
    assert rule("/$").kind == "ending" and rule("/$").match_pattern == "/"
    assert rule("/*").kind == "universal" and rule("/*").match_pattern == "/*"
    assert rule("/*$").kind == "regex" and rule("/*$").match_pattern == "^/.*\\Z"
    # star runs collapse before regex/universal construction
    assert rule("/a***b").match_pattern == "/a*b"
    with pytest.raises(WildcardError):
        rule("/a$b")  # EndingPosition
    with pytest.raises(WildcardError):
        rule("/a$b$")  # TooManyEndings


def test_rule_sort_order():
    # parser.rs:39-42 + rule.rs:216-221: length desc, allow desc.
    rules = R.sort_rules([
        Rule.new("/ab", False), Rule.new("/abc", False),
        Rule.new("/ab", True), Rule.new("/a", True),
    ])
    assert [(r.pattern, r.allow) for r in rules] == [
        ("/abc", False), ("/ab", True), ("/ab", False), ("/a", True)]


# --- precedence (inner.rs:194-239) ------------------------------------------

PRECEDENCE_CASES = [
    (b"Allow: /p \n Disallow: /", "/page", True),
    (b"Allow: /folder \n Disallow: /folder", "/folder/page", True),
    (b"Allow: /page \n Disallow: /*.ph", "/page.php5", True),
    (b"Allow: /page \n Disallow: /*.htm", "/page.htm", False),
    (b"Allow: /$ \n Disallow: /", "/", True),
    (b"Allow: /$ \n Disallow: /", "/page.htm", False),
]


@pytest.mark.parametrize("txt,path,expected", PRECEDENCE_CASES)
@pytest.mark.parametrize("optimal", [True, False])
def test_precedence_rules(txt, path, expected, optimal):
    r = Robots.from_bytes(txt, ALL_UAS, optimal=optimal)
    assert r.is_allowed(path) is expected


# --- UA group selection (inner.rs:241-306) ----------------------------------

AGENT_TXT = b'''"""
    User-Agent: bot-robotxt
    Allow: /1
    Disallow: /

    User-Agent: *
    Allow: /2
    Disallow: /

    User-Agent: bot
    Allow: /3
    Disallow: /
"""'''

AGENT_CASES = [
    ("bot-robotxt", {"/1": True, "/2": False, "/3": False}),
    ("bot", {"/1": False, "/2": False, "/3": True}),
    ("super-bot", {"/1": False, "/2": True, "/3": False}),
    ("bot-super", {"/1": False, "/2": False, "/3": True}),
]


@pytest.mark.parametrize("ua,expectations", AGENT_CASES)
def test_precedence_agents(ua, expectations):
    r = Robots.from_bytes(AGENT_TXT, ua)
    for path, expected in expectations.items():
        assert r.is_allowed(path) is expected, (ua, path)


def test_longest_ua_prefix_selected():
    # parse/mod.rs:299-312 doctest: foo/foobot/foobot-images, client
    # "foobot-search" -> "foobot".
    txt = b"User-Agent: foo\nUser-Agent: foobot\nUser-Agent: foobot-images\n"
    assert Robots.from_bytes(txt, "foobot-search").user_agent == "foobot"


def test_rules_before_first_ua_belong_to_star():
    txt = b"Disallow: /secret\nUser-Agent: foobot\nAllow: /"
    assert Robots.from_bytes(txt, "otherbot").is_allowed("/secret") is False
    assert Robots.from_bytes(txt, "foobot").is_allowed("/secret") is True


def test_multi_ua_header_captures_once():
    # consecutive UA lines form one header (parser.rs:71-86)
    txt = b"User-Agent: a\nUser-Agent: b\nDisallow: /x"
    assert Robots.from_bytes(txt, "a").is_allowed("/x") is False
    assert Robots.from_bytes(txt, "b").is_allowed("/x") is False
    assert Robots.from_bytes(txt, "c").is_allowed("/x") is True


# --- optimal collapse (inner.rs:151-191) ------------------------------------


def test_optimal_output():
    assert Robots.from_always(True, "foo").is_always() is True
    assert Robots.from_always(False, "foo").is_always() is False
    assert Robots.from_bytes(b"", ALL_UAS).is_always() is True
    assert Robots.from_bytes(b"Allow: / \n Allow: /foo", ALL_UAS).is_always() is True
    assert Robots.from_bytes(b"Disallow: /* \n Disallow: /foo", ALL_UAS).is_always() is False
    assert Robots.from_bytes(b"Disallow: /* \n Allow: /foo", ALL_UAS).is_always() is None
    assert Robots.from_bytes(b"Disallow: /", ALL_UAS, optimal=False).is_always() is None


# --- access results (parse/mod.rs:144-151 doctests) -------------------------


def test_access_results():
    r = Robots.from_access("redirect", None, "foobot")
    assert r.is_allowed("/example/nope.txt") is True
    r = Robots.from_access("unavailable", None, "foobot")
    assert r.is_allowed("/example/nope.txt") is True
    r = Robots.from_access("unreachable", None, "foobot")
    assert r.is_allowed("/example/yeah.txt") is False
    txt = b"User-Agent: foobot\nDisallow: *\nAllow: /example/\nDisallow: /example/nope.txt"
    r = Robots.from_access("successful", txt, "foobot")
    assert r.is_allowed("/example/yeah.txt") is True
    assert r.is_allowed("/example/nope.txt") is False
    assert r.is_allowed("/invalid/path.txt") is False


# --- lexer (lexer.rs:201-227 + misspellings + separators) -------------------


def test_lexer_single_and_empty_lines():
    assert R.lex("user-agent: robotxt") == [(R.UA, "robotxt")]
    tokens = R.lex("\n            user-agent: robotxt\n\n            user-agent: robotxt")
    assert [t for t in tokens if t[0] == R.UA] == [(R.UA, "robotxt")] * 2
    assert len([t for t in tokens if t[0] == R.UNKNOWN]) == 2


@pytest.mark.parametrize("spelling,kind", [
    ("user-agent", R.UA), ("user agent", R.UA), ("useragent", R.UA),
    ("USER-AGENT", R.UA),
    ("allow", R.ALLOW), ("alow", R.ALLOW), ("allaw", R.ALLOW),
    ("disallow", R.DISALLOW), ("dissallow", R.DISALLOW),
    ("dissalow", R.DISALLOW), ("disalow", R.DISALLOW),
    ("diasllow", R.DISALLOW), ("disallaw", R.DISALLOW),
    ("crawl-delay", R.CRAWL_DELAY), ("crawl delay", R.CRAWL_DELAY),
    ("crawldelay", R.CRAWL_DELAY),
    ("sitemap", R.SITEMAP), ("site-map", R.SITEMAP), ("site map", R.SITEMAP),
])
def test_lexer_misspellings(spelling, kind):
    assert R.lex(f"{spelling}: /value")[0] == (kind, "/value")


def test_lexer_separators_comments_trim():
    assert R.lex("allow : /a ")[0] == (R.ALLOW, "/a")
    assert R.lex("allow /a")[0] == (R.ALLOW, "/a")  # space separator
    assert R.lex("allow: /a # comment")[0] == (R.ALLOW, "/a")
    assert R.lex("allow/a")[0][0] == R.UNKNOWN  # no separator -> unknown
    assert R.lex("foo: bar")[0][0] == R.UNKNOWN


def test_empty_disallow_is_allow_all():
    # lexer.rs:135-142
    assert R.lex("Disallow:")[0] == (R.ALLOW, "/")
    assert R.lex("Disallow: ")[0] == (R.ALLOW, "/")
    r = Robots.from_bytes(b"User-agent: *\nDisallow:", ALL_UAS, optimal=False)
    assert r.is_allowed("/anything") is True


def test_byte_limit_nul_and_bom():
    # inner.rs:36-48 + lexer.rs:80-83
    body = b"\xef\xbb\xbfUser-agent: *\x00Disallow: /blocked\n"
    r = Robots.from_bytes(body, ALL_UAS)
    assert r.is_allowed("/blocked") is False
    # a rule that starts beyond the 512,000-byte cap is never parsed
    filler = b"# " + b"x" * R.BYTE_LIMIT + b"\nDisallow: /\n"
    r = Robots.from_bytes(filler, ALL_UAS)
    assert r.is_allowed("/anything") is True


def test_crawl_delay_min_fold_and_float():
    # parser.rs:99-111: duplicates fold to min; floats parsed
    txt = b"User-agent: *\nCrawl-delay: 4.5\nCrawl-delay: 2.5\nCrawl-delay: 3"
    assert Robots.from_bytes(txt, ALL_UAS).crawl_delay == 2.5
    assert Robots.from_bytes(b"Crawl-delay: -1", ALL_UAS).crawl_delay is None
    assert Robots.from_bytes(b"Crawl-delay: nope", ALL_UAS).crawl_delay is None
    # delay belongs to the selected group only
    txt = b"User-agent: a\nCrawl-delay: 5\nUser-agent: b\nCrawl-delay: 7"
    assert Robots.from_bytes(txt, "b").crawl_delay == 7.0
    assert Robots.from_bytes(txt, "zzz").crawl_delay is None


def test_sitemaps_are_global():
    # parser.rs:114-120: collected regardless of UA group; invalid dropped
    txt = (b"User-agent: a\nSitemap: https://example.com/a.xml\n"
           b"User-agent: b\nSitemap: https://example.com/b.xml\n"
           b"Sitemap: not-a-url\n")
    r = Robots.from_bytes(txt, "zzz")
    assert list(r.sitemaps) == ["https://example.com/a.xml", "https://example.com/b.xml"]


def test_robots_txt_always_allowed_unless_always_false():
    r = Robots.from_bytes(b"User-agent: *\nDisallow: /", ALL_UAS, optimal=False)
    assert r.is_allowed("/robots.txt") is True
    # with optimal collapse, Always(false) short-circuits before the
    # special-case — reference behavior (inner.rs:92-103)
    r = Robots.from_bytes(b"User-agent: *\nDisallow: /", ALL_UAS, optimal=True)
    assert r.is_allowed("/robots.txt") is False


def test_cache_round_trip():
    # serde.rs:111-151 (mod cache)
    txt = (b"User-Agent: foobot\nDisallow: *\nAllow: /example/\n"
           b"Disallow: /example/nope.txt\nCrawl-Delay: 5\n"
           b"Sitemap: https://example.com/1.xml")
    r0 = Robots.from_bytes(txt, "foobot")
    assert len(r0.sitemaps) == 1 and r0.is_always() is None
    r1 = Robots.from_cache(r0.to_cache())
    assert r1.user_agent == r0.user_agent
    assert [ (r.pattern, r.allow) for r in r1.rules ] == [ (r.pattern, r.allow) for r in r0.rules ]
    for p in ("/example/yeah.txt", "/example/nope.txt", "/other"):
        assert r0.is_allowed(p) == r1.is_allowed(p)
    for always in (True, False):
        r0 = Robots.from_always(always, "foo")
        assert Robots.from_cache(r0.to_cache()).is_always() is always


def test_normalize_path():
    # exclusion/paths/normal.rs:7-20
    assert R.normalize_path("foo") == "/foo"
    assert R.normalize_path("/a b") == "/a%20b"
    assert R.normalize_path('/q"<>') == "/q%22%3C%3E"
    assert R.normalize_path("/café") == "/caf%C3%A9"
    assert R.normalize_path("/ok-_.~/x?y=1#f") == "/ok-_.~/x?y=1#f"


def test_regex_size_cap_drops_pathological_rule():
    """A *+$ pattern whose translated regex exceeds 42 KiB is dropped,
    matching the reference's regex Builder size limit (rule.rs:68-71 ->
    rule dropped at parser.rs:92); small regex rules are unaffected."""
    import pytest as _pytest

    from kit_spark.kit_py.robots import (REGEX_SIZE_LIMIT, Robots, Rule,
                                         WildcardError, classify_pattern)

    big = "/" + "ab*" * (REGEX_SIZE_LIMIT // 3) + "$"
    with _pytest.raises(WildcardError):
        classify_pattern(big)
    with _pytest.raises(WildcardError):
        Rule.new(big, allow=False)
    # through the full parse: the oversized Disallow is dropped, so the
    # path it would have blocked stays allowed; the sane rule still gates
    body = f"User-agent: *\nDisallow: {big}\nDisallow: /private/\n".encode()
    robots = Robots.from_bytes(body, "testbot")
    assert robots.is_allowed("/abababab")
    assert not robots.is_allowed("/private/x")
    # control: a normal *$ pattern still compiles
    small = Robots.from_bytes(b"User-agent: *\nDisallow: /*.tmp$\n", "t")
    assert not small.is_allowed("/a/b.tmp")
    assert small.is_allowed("/a/b.tmpx")
