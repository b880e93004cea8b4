"""Property-based invariants for URL canonicalization (functions/urls.py)
over hypothesis-generated URL structures — the cases a hand-written table
never covers: weird label casing, every port/scheme combination, tracking
keys mixed through the param list, empty paths, fragments containing query
syntax.

Each example batch runs as ONE Spark job (a local DataFrame of all the
generated URLs) so hypothesis can afford real example counts.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.functions.urls import canonicalize_url

label = st.from_regex(r"[A-Za-z][A-Za-z0-9\-]{0,8}", fullmatch=True)
seg = st.from_regex(r"[A-Za-z0-9._~\-]{1,10}", fullmatch=True)
pkey = st.one_of(
    st.from_regex(r"[a-z][a-z0-9]{0,6}", fullmatch=True),
    st.sampled_from(["utm_source", "utm_campaign", "gclid", "fbclid"]),
)
pval = st.from_regex(r"[A-Za-z0-9\-]{0,8}", fullmatch=True)

url_parts = st.fixed_dictionaries(
    {
        "scheme": st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
        "host": st.lists(label, min_size=2, max_size=4).map(".".join),
        "port": st.sampled_from(["", ":80", ":443", ":8080"]),
        "path": st.lists(seg, min_size=0, max_size=3).map(
            lambda s: "/" + "/".join(s) if s else ""
        ),
        "params": st.lists(st.tuples(pkey, pval), min_size=0, max_size=5),
        "frag": st.sampled_from(["", "#x", "#a?b=1", "#frag/with/slash"]),
    }
)

TRACKING = {"utm_source", "utm_campaign", "gclid", "fbclid"}


def build(p):
    q = "&".join(f"{k}={v}" for k, v in p["params"])
    return (
        f"{p['scheme']}://{p['host']}{p['port']}{p['path']}"
        + (f"?{q}" if q else "")
        + p["frag"]
    )


@settings(max_examples=12, deadline=None)
@given(st.lists(url_parts, min_size=1, max_size=25))
def test_canonicalize_properties(spark, parts):
    raws = [(build(p),) for p in parts]
    df = spark.createDataFrame(raws, "url string")
    got = [
        (r["c1"], r["c2"])
        for r in df.select(
            canonicalize_url("url", drop_tracking=True).alias("c1"),
        )
        .select("c1", canonicalize_url("c1", drop_tracking=True).alias("c2"))
        .collect()
    ]
    for p, (c1, c2) in zip(parts, got):
        # idempotence: canonical form is a fixed point
        assert c2 == c1, (build(p), c1, c2)
        # scheme+host lowercased, fragment gone
        scheme, rest = c1.split("://", 1)
        assert scheme == p["scheme"].lower()
        assert "#" not in c1
        hostport = rest.split("/", 1)[0].split("?", 1)[0]
        assert hostport.split(":", 1)[0] == p["host"].lower()
        # default ports dropped, non-defaults kept
        default = (scheme == "http" and p["port"] == ":80") or (
            scheme == "https" and p["port"] == ":443"
        )
        if p["port"] and not default:
            assert hostport.endswith(p["port"])
        else:
            assert ":" not in hostport
        # query: tracking keys gone, surviving params = sorted multiset
        expect = sorted(
            f"{k}={v}" for k, v in p["params"] if k not in TRACKING
        )
        got_q = c1.split("?", 1)[1].split("&") if "?" in c1 else []
        assert got_q == expect, (build(p), c1)
        # bare host (no path, no query) ends with exactly '/'
        if not p["path"] and not expect:
            assert c1.endswith(p["host"].lower() + (
                p["port"] if p["port"] and not default else "") + "/")


# ---------------------------------------------------------------- blocklist

_bl_label = st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True)
_bl_host = st.lists(_bl_label, min_size=2, max_size=5).map(".".join)


def _naive_blocked(host: str, entries: list[str]) -> str | None:
    """Reference semantics: dot-boundary suffix or exact match; min entry."""
    hits = [e for e in entries
            if host == e or host.endswith("." + e)]
    return min(hits) if hits else None


@settings(max_examples=12, deadline=None)
@given(
    hosts=st.lists(_bl_host, min_size=1, max_size=12, unique=True),
    entries=st.lists(_bl_host, min_size=1, max_size=4, unique=True),
)
def test_blocklist_matches_naive_suffix_semantics(spark, hosts, entries):
    from etherscan_contract_crawler_spark.functions.urls import blocklist_match

    hdf = spark.createDataFrame([(h,) for h in hosts], ["host"])
    bdf = spark.createDataFrame([(e,) for e in entries], ["entry"])
    got = {r.host: (r.blocked, r.matched)
           for r in blocklist_match(hdf, bdf).collect()}
    for h in hosts:
        want = _naive_blocked(h, entries)
        assert got[h] == (want is not None, want), (h, entries)
