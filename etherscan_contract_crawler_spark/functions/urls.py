"""URL canonicalization, keying, and domain extraction — pure Column exprs.

Reference semantics being generalized (all row-at-a-time Python there):
  - lowercase canonicalization of addresses at ingest
    (reference ``contract_crawler.py:362``, ``:365``, ``:463``; the engine
    canonicalizes uniformly, fixing reference quirk SURVEY.md §8 B6);
  - URL -> key projection ``url.split('/')[-1].split('#')[0]``
    (``contract_crawler.py:328``, ``:337``);
  - address validity regex ``^0x[a-fA-F0-9]{40}$``
    (``contract_crawler.py:367-369``).

Everything here is a composition of built-in functions (``parse_url``,
``regexp_*``, ``sort_array`` ...) so Catalyst keeps whole-stage codegen and
can push derived filters into scans. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Validity filter for the reference's seed keys (contract addresses).
ETH_ADDRESS_RE = r"^0x[a-fA-F0-9]{40}$"

from .psl import registrable_domain_psl  # full PSL semantics (r1 VERDICT #8)


def is_valid_eth_address(col: Column | str) -> Column:
    """P1 — address-validity predicate (contract_crawler.py:367-369)."""
    return F.regexp_like(F.col(col) if isinstance(col, str) else col, F.lit(ETH_ADDRESS_RE))


def url_strip_fragment(url: Column) -> Column:
    """Fragment never reaches the server — drop it (canonicalization step)."""
    return F.substring_index(url, "#", 1)


#: session/click-tracking query parameters that never change the resource —
#: the standard crawl-dedup strip list (utm_* per Google's campaign spec,
#: plus the big ad/analytics click ids). Anchored key match only: a param
#: VALUE containing "utm_" is untouched.
TRACKING_PARAMS_RE = (
    r"(?i)^(utm_[a-z0-9]+|gclid|fbclid|msclkid|yclid|mc_eid|igshid|spm|_ga)="
)


#: URI-component regexes (RFC 3986 shapes, VALIDATION-FREE on purpose):
#: ``parse_url`` rides Java's URI parser, which returns NULL for hosts the
#: RFC forbids but the real web serves anyway (labels ending in '-', digit
#: TLDs, ...) — hypothesis found canonicalize_url returning NULL keys for
#: them. A crawler must canonicalize garbage, not null it, so components
#: are lifted with plain regexes: same codegen class, no validation.
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


def url_host(url: Column | str) -> Column:
    """Lowercased host of a URL — no port, no userinfo; ``''`` when the
    string has no ``scheme://authority`` shape (never NULL)."""
    u = url_strip_fragment(F.trim(F.col(url) if isinstance(url, str) else url))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    return F.lower(
        F.regexp_replace(F.regexp_replace(auth, r"^[^@]*@", ""), r":\d+$", "")
    )


def canonicalize_url(url: Column | str, drop_tracking: bool = False) -> Column:
    """Canonical URL: lowercase scheme+host, strip fragment & default port &
    userinfo, '/' for the empty path, sort query parameters; with
    ``drop_tracking`` also shed session/campaign params (utm_*, gclid, ...)
    so the same resource under N campaign links folds to ONE frontier key.

    Spark-first analog of the reference's ad-hoc ``.lower()`` calls
    (contract_crawler.py:362) extended to full URLs. Built entirely from
    regex/string builtins so it stays inside codegen — and NEVER returns
    NULL: a string without a parseable ``scheme://host`` comes back
    trimmed + fragment-stripped (identity fallback, still a fixed point),
    so a garbage discovery can't null a frontier key downstream.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = url_strip_fragment(u)
    proto = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.regexp_replace(F.regexp_extract(u, _AUTH_RE, 1), r"^[^@]*@", "")
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    host = F.lower(F.regexp_replace(auth, r":\d+$", ""))
    # keep a non-default explicit port; drop :80 (http) / :443 (https)
    is_default = ((proto == "http") & (port == "80")) | ((proto == "https") & (port == "443"))
    hostport = F.when((port != "") & ~is_default, F.concat(host, F.lit(":"), port)).otherwise(host)
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"^[^?]*\?(.*)$", 1)
    params = F.split(query, "&")
    if drop_tracking:
        params = F.filter(params, lambda p: ~p.rlike(TRACKING_PARAMS_RE))
    sorted_query = F.when(
        (query == "") | (F.size(params) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(F.sort_array(params), "&")))
    canon = F.concat(proto, F.lit("://"), hostport, path, sorted_query)
    return F.when((proto != "") & (host != ""), canon).otherwise(u)


def url_sha1(url_canon: Column | str) -> Column:
    """F3 — URL-seen key: sha1 of the canonical URL (north_star contract).

    Reference analog: md5 content hashing (solidity-naive-checksum.py:12-15)
    and lowercase-address-as-key (contract_crawler.py:362).
    """
    return F.sha1(F.col(url_canon) if isinstance(url_canon, str) else url_canon)


def registrable_domain(url_or_host: Column | str, is_host: bool = False) -> Column:
    """Registrable domain of a URL (the frontier's partition dimension),
    under full public-suffix-list semantics (functions/psl.py: exact,
    wildcard, and exception rules; longest match wins).

    Spark analog of the reference's per-network dispatch
    (contract_crawler.py:32-36, :425-447) generalized to arbitrary hosts.
    """
    c = F.col(url_or_host) if isinstance(url_or_host, str) else url_or_host
    # url_host is validation-free (regex lift) — RFC-invalid-but-served
    # hosts still partition the frontier instead of collapsing into one
    # NULL bucket; '' (no scheme://authority shape) maps to NULL here to
    # keep this function's historical no-host contract
    host = c if is_host else F.nullif(url_host(c), F.lit(""))
    host = F.regexp_replace(host, r":\d+$", "")  # strip port
    return registrable_domain_psl(host)


def domain_hash(domain: Column | str, n_buckets: int) -> Column:
    """Bucket key for frontier partitioning: pmod(xxhash64(domain), N).

    Same bucketing drives the bloom-filter segmentation (SURVEY.md §4), so a
    probe task touches exactly one segment.
    """
    c = F.col(domain) if isinstance(domain, str) else domain
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def url_key_projection(url: Column | str) -> Column:
    """P6 — extract the trailing key from a URL:
    ``url.split('/')[-1].split('#')[0]`` (contract_crawler.py:328, :337).
    """
    c = F.col(url) if isinstance(url, str) else url
    return F.substring_index(F.element_at(F.split(c, "/"), -1), "#", 1)


def url_path_segments(url: Column | str) -> Column:
    """Path segments of a URL as ``array<string>`` (empty segments dropped).

    ``parse_url(..., 'PATH')`` keeps whole-stage codegen; the filter drops
    the artifacts of leading/duplicate slashes so depth counts segments,
    not separators.
    """
    c = F.col(url) if isinstance(url, str) else url
    segs = F.split(F.parse_url(c, F.lit("PATH")), "/")
    return F.filter(segs, lambda s: s != "")


def trap_signals(url: Column | str) -> Column:
    """Crawl-trap signals for a URL as a struct
    ``(depth int, n_params int, n_repeated int, is_trap boolean)``.

    Calendar pages, session-id query strings, and symlink loops generate
    unbounded URL spaces under a single domain — the classic crawler traps.
    The reference never meets them (its universe is one finite listing,
    contract_crawler.py:316-325); a 10^10-URL frontier must shed them
    BEFORE they enter the frontier or a hot domain's politeness budget is
    spent on garbage. Signals, all pure Column exprs (no UDF, no shuffle —
    a scan-level projection a Catalyst filter can ride on):

      * ``depth``       — path-segment count (deep = auto-generated);
      * ``n_params``    — query parameters (session ids, facet explosions);
      * ``n_repeated``  — depth minus distinct segments (loops repeat
        segments: ``/a/b/a/b/...``) — set semantics, NOT regex
        backreferences, so an RE2-based oracle can re-derive it;
      * ``is_trap``     — ``depth >= 10 OR n_params >= 4 OR
        (depth >= 6 AND n_repeated*2 >= depth)``.
    """
    segs = url_path_segments(url)
    c = F.col(url) if isinstance(url, str) else url
    q = F.parse_url(c, F.lit("QUERY"))
    depth = F.size(segs)
    n_params = F.when(
        q.isNull() | (q == ""), F.lit(0)
    ).otherwise(F.size(F.split(q, "&")))
    n_repeated = depth - F.size(F.array_distinct(segs))
    is_trap = (
        (depth >= 10)
        | (n_params >= 4)
        | ((depth >= 6) & (n_repeated * 2 >= depth))
    )
    return F.struct(
        depth.cast("int").alias("depth"),
        n_params.cast("int").alias("n_params"),
        n_repeated.cast("int").alias("n_repeated"),
        is_trap.alias("is_trap"),
    )


def surt_key(url: Column | str) -> Column:
    """SURT-form sort key of a URL: ``tld,…,host[:port])/path?sortedquery``
    (Sort-friendly URI Reordering Transform, the key format web archives
    index CDX files under — e.g. ``https://news.Example.co.uk/a?b=2&a=1``
    → ``uk,co,example,news)/a?a=1&b=2``).

    Built ON TOP of :func:`canonicalize_url` (lowercase host, fragment and
    default port and userinfo gone, query params sorted), then the host's
    dot-labels reversed and comma-joined. ``www`` is kept — the key must
    stay injective per canonical URL (dropping it would merge distinct
    hosts); locality is identical either way because ``www`` sorts inside
    its registrable domain's prefix.

    Why the frontier wants it: lexicographic order on SURT clusters every
    URL of a registrable domain (and every subdomain under it) into ONE
    contiguous key range. Range-partition or sort the frontier by this key
    and (a) per-domain politeness/scheduling scans become partition-pruned
    prefix ranges instead of hash probes across all partitions, (b) a
    domain-scoped export is a range scan, (c) parquet min/max column stats
    on the key prune files at scan time. Pure Column exprs — regex lift +
    ``reverse``/``array_join`` — zero shuffle, full codegen; the
    no-``scheme://host`` fallback mirrors canonicalize_url (returns the
    trimmed input so garbage can't NULL a sort key).

    Reference analog: the reference keys its universe by lowercased
    address (contract_crawler.py:362) — this is the same "one canonical
    sortable key per resource" idea at web scale.
    """
    canon = canonicalize_url(url)
    hostport = F.regexp_extract(canon, _AUTH_RE, 1)
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r"(:\d+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_replace(canon, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(
        host != "", F.concat(rev, port, F.lit(")"), rest)
    ).otherwise(canon)


def host_suffixes(host: Column | str, min_labels: int = 2) -> Column:
    """All dot-boundary suffixes of ``host`` with at least ``min_labels``
    labels, longest first (the full host is element 0). ``a.b.site.com`` →
    ``[a.b.site.com, b.site.com, site.com]``. Pure Column exprs
    (split + transform over a sequence + slice) — zero shuffle, codegen.
    """
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n - min_labels, F.lit(0))),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )


def blocklist_match(
    hosts: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    entry_col: str = "entry",
) -> DataFrame:
    """Domain blocklist filtering the way curation pipelines apply UT1 /
    Dolma-style blocklists: a host is blocked when it EQUALS a blocklist
    entry or is a subdomain of one (dot-boundary suffix match — never a
    substring match, which would false-positive ``notexample.com``).

    Scale shape: the blocklist is small (UT1 is a few MB) and the host set
    is the 10^10-URL frontier, so the big side NEVER shuffles on a
    blocklist key: each host explodes into its ≤depth dot-suffixes
    (bounded per-row work) and probes the BROADCAST entry set; one hash
    agg keyed by the original host folds multi-entry matches (min entry
    kept, deterministic). The frontier-side rows flow map-side only —
    explode → broadcast-hash-join → partial agg.

    Output: (host_col, blocked bool, matched — most-specific/min matching
    entry or NULL).
    """
    probe = hosts.select(
        host_col, F.explode(host_suffixes(F.col(host_col))).alias("_suf")
    )
    hits = (
        probe.join(
            F.broadcast(blocklist.select(F.col(entry_col).alias("_suf"))),
            "_suf",
        )
        .groupBy(host_col)
        .agg(F.min("_suf").alias("matched"))
    )
    return hosts.select(host_col).join(hits, host_col, "left").select(
        host_col,
        F.col("matched").isNotNull().alias("blocked"),
        "matched",
    )


def tracking_param_mine(
    urls: DataFrame,
    min_urls: int = 50,
    url_col: str = "url",
) -> DataFrame:
    """Mine candidate tracking/session query parameters from the corpus.

    ``canonicalize_url(drop_tracking=True)`` sheds a STATIC param list
    (utm_*, gclid, ...); real crawls meet site-specific session params the
    list has never heard of. The mining signal is dispersion: a parameter
    that appears on many URLs and whose value is almost always distinct
    (sessid, token, timestamps) carries no addressing information — each
    value names the same resource — so it's a canonicalization candidate;
    a parameter with few distinct values (page, lang, sort) is addressing.
    ``n_urls`` counts DISTINCT URLs carrying the param (a multi-valued
    ``?tag=a&tag=b`` URL counts once toward the frequency floor), while
    dispersion compares distinct values against total occurrences. Flag
    rule, integer cross-multiplied (no float boundary):
    ``n_urls >= min_urls AND 10 * n_distinct_vals >= 9 * n_occurrences``.

    Returns (param, n_urls, n_occurrences, n_distinct_vals, uniq_ratio,
    candidate) — review output; the accepted set feeds the
    TRACKING_PARAMS_RE dim.

    Scale notes: explode query params (Generate, no shuffle), then ONE
    grouped aggregate with two exact distinct counts (Spark plans the
    multi-distinct via expand — a 3x row multiplication of the
    param-pair stream, the accepted cost of exact distincts; swap in
    approx_count_distinct for a 100-TB profile run). Ratio rounded to
    6 dp in both engines.
    """
    u = F.col(url_col)
    query = F.regexp_extract(u, r"^[^?#]*\?([^#]*)", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != F.lit(""))
    pairs = urls.select(u.alias("_u"), F.explode(params).alias("p")).select(
        "_u",
        F.substring_index("p", "=", 1).alias("param"),
        F.regexp_extract("p", r"^[^=]*=?(.*)$", 1).alias("val"),
    )
    agg = pairs.groupBy("param").agg(
        F.count_distinct("_u").cast("long").alias("n_urls"),
        F.count("*").cast("long").alias("n_occurrences"),
        F.count_distinct("val").cast("long").alias("n_distinct_vals"),
    )
    return agg.select(
        "param",
        "n_urls",
        "n_occurrences",
        "n_distinct_vals",
        F.round(F.col("n_distinct_vals") / F.col("n_occurrences"), 6).alias(
            "uniq_ratio"
        ),
        (
            (F.col("n_urls") >= int(min_urls))
            & (10 * F.col("n_distinct_vals") >= 9 * F.col("n_occurrences"))
        ).alias("candidate"),
    )
