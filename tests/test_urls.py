"""URL canonicalization / keying — Spark exprs vs the pure-Python oracle."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.functions import urls as U
from etherscan_contract_crawler_spark.oracle.reference_oracle import (
    canonicalize_url_py,
    registrable_domain_py,
    sha1_py,
    url_key_py,
)

TRICKY = [
    "https://SITE00001.Example.COM/address/0xAbCd#code",
    "https://site.example.com/a/b?z=1&a=2&m=0",
    "http://host.example.org:80/path#frag",
    "https://host.example.org:443/path",
    "https://host.example.org:8443/path?b=2&a=1#x",
    "https://example.co.uk/address/0x1234",
    "https://sub.deep.example.co.uk/x",
    "  https://padded.example.net/x  ",
    "https://bare.example.io",
    "https://site00003.example.net/address/0xff#code2",
    # PSL semantics (functions/psl.py): 3-label private suffix, wildcard
    # rule, exception rule, unknown TLD (default rule)
    "https://deep.sub.pvt.github.io/x",
    "https://bucket.name.s3.amazonaws.com/obj",
    "https://a.b.foo.ck/x",
    "https://www.ck/x",
    "https://x.y.co.kr/x",
    "https://some.unknowntld/x",
]


def test_canonicalize_matches_oracle(spark):
    df = spark.createDataFrame([(u,) for u in TRICKY], "url string")
    got = df.select(U.canonicalize_url("url").alias("c")).collect()
    for row, u in zip(got, TRICKY):
        assert row.c == canonicalize_url_py(u), u


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in TRICKY], "url string")
    twice = df.select(
        U.canonicalize_url("url").alias("c1"),
        U.canonicalize_url(U.canonicalize_url("url")).alias("c2"),
    ).collect()
    for r in twice:
        assert r.c1 == r.c2


def test_registrable_domain_matches_oracle(spark):
    df = spark.createDataFrame([(u,) for u in TRICKY], "url string")
    got = df.select(U.registrable_domain("url").alias("d")).collect()
    for row, u in zip(got, TRICKY):
        assert row.d == registrable_domain_py(u), u


def test_url_sha1_matches_hashlib(spark):
    df = spark.createDataFrame([(u,) for u in TRICKY], "url string")
    got = df.select(
        U.url_sha1(U.canonicalize_url("url")).alias("s"),
        U.canonicalize_url("url").alias("c"),
    ).collect()
    for r in got:
        assert r.s == sha1_py(r.c)


def test_url_key_projection(spark):
    df = spark.createDataFrame([(u,) for u in TRICKY], "url string")
    got = df.select(U.url_key_projection("url").alias("k")).collect()
    for row, u in zip(got, TRICKY):
        assert row.k == url_key_py(u), u


def test_validity_filter(spark):
    rows = [
        ("0x" + "a" * 40, True),
        ("0x" + "A" * 40, True),
        ("0x" + "g" * 40, False),  # non-hex
        ("0x" + "a" * 39, False),  # short
        ("x" + "a" * 40, False),
        ("", False),
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], "addr string")
    got = df.select(U.is_valid_eth_address("addr").alias("v")).collect()
    for r, (_, expect) in zip(got, rows):
        assert r.v == expect


def test_registrable_domain_psl_pinned_values(spark):
    """PSL rules pinned to expected literals (both the Spark expression and
    the python oracle could share a bug — this pins ground truth)."""
    cases = {
        "https://deep.sub.pvt.github.io/x": "pvt.github.io",      # private suffix
        "https://bucket.name.s3.amazonaws.com/o": "name.s3.amazonaws.com",  # 3-label
        "https://a.b.foo.ck/x": "b.foo.ck",                       # wildcard *.ck
        "https://www.ck/x": "www.ck",                             # exception !www.ck
        "https://x.y.co.kr/x": "y.co.kr",                         # ccTLD 2nd level
        "https://sub.deep.example.co.uk/x": "example.co.uk",
        "https://plain.example.com/x": "example.com",
        "https://some.unknowntld/x": "some.unknowntld",           # default rule
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = df.select("url", U.registrable_domain("url").alias("d")).collect()
    for r in got:
        assert r.d == cases[r.url], r.url


def test_surt_key_pinned_values(spark):
    """SURT semantics pinned to ground-truth literals (canonicalization +
    host reversal + port/userinfo/query handling in one key)."""
    cases = {
        "https://news.Example.co.uk/a?b=2&a=1#frag": "uk,co,example,news)/a?a=1&b=2",
        "http://WWW.Test.com:8080/x/y": "com,test,www:8080)/x/y",
        "https://example.com:443/": "com,example)/",
        "http://example.com": "com,example)/",
        "http://user:pw@Host.net:80/p?z=1": "net,host)/p?z=1",
        "not a url": "not a url",  # identity fallback — never NULL
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = df.select("url", U.surt_key("url").alias("k")).collect()
    for r in got:
        assert r.k == cases[r.url], r.url


def test_surt_key_domain_locality(spark):
    """The property the frontier buys: sorting by SURT makes every URL of a
    registrable domain (including all subdomains) one CONTIGUOUS run — the
    precondition for range-partition pruning of per-domain scans."""
    urls = [
        "https://a.example.com/1",
        "https://z-other.org/x",
        "https://example.com/2",
        "https://b.example.com/3",
        "https://aardvark.net/y",
        "https://example.com/0",
        "https://sub.deep.example.com/4",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = (
        df.select(U.surt_key("url").alias("k"),
                  U.registrable_domain("url").alias("d"))
        .orderBy("k")
        .collect()
    )
    doms = [r.d for r in rows]
    # each registrable domain appears as exactly one contiguous block
    seen, prev = set(), None
    for d in doms:
        if d != prev:
            assert d not in seen, f"domain {d} split across the sort order"
            seen.add(d)
        prev = d
