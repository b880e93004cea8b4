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

from pyspark.sql import Column
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


def canonicalize_url(url: Column | str, drop_tracking: bool = False) -> Column:
    """Canonical URL: lowercase scheme+host, strip fragment & default port,
    drop trailing '/' on bare hosts, sort query parameters; with
    ``drop_tracking`` also shed session/campaign params (utm_*, gclid, ...)
    so the same resource under N campaign links folds to ONE frontier key.

    Spark-first analog of the reference's ad-hoc ``.lower()`` calls
    (contract_crawler.py:362) extended to full URLs. Built entirely from
    ``parse_url`` + string builtins so it stays inside codegen.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = url_strip_fragment(u)
    proto = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))  # parse_url HOST excludes the port
    # keep a non-default explicit port; drop :80 (http) / :443 (https)
    port = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*:(\d+)(?:[/?#]|$)", 1)
    is_default = ((proto == "http") & (port == "80")) | ((proto == "https") & (port == "443"))
    host = F.when((port != "") & ~is_default, F.concat(host, F.lit(":"), port)).otherwise(host)
    path = F.parse_url(u, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = F.parse_url(u, F.lit("QUERY"))
    params = F.split(query, "&")
    if drop_tracking:
        params = F.filter(params, lambda p: ~p.rlike(TRACKING_PARAMS_RE))
    sorted_query = F.when(
        query.isNull() | (query == "") | (F.size(params) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(F.sort_array(params), "&")))
    return F.concat(proto, F.lit("://"), host, path, sorted_query)


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
    host = c if is_host else F.lower(F.parse_url(url_strip_fragment(F.trim(c)), F.lit("HOST")))
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
