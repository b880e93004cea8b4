"""HTTP cache-policy → revisit scheduling (RFC 9111 subset).

operators/recrawl.py derives recrawl lanes from OBSERVED change history;
this module derives the revisit budget the server itself DECLARES — the
two compose: the protocol policy is the floor (never poll inside a fresh
max-age window), the observed-change lane is the ceiling. The reference
refetches unconditionally on every run (contract_crawler.py:316-325,
no header handling at all); at 10^10 URLs the declared policy is most of
the fetch budget.

Everything is Column expressions over the raw response-header block
(one string column, exactly as the fetch path lands it): case-insensitive
header lift, directive extracts, CASE ladder — a scan-level projection
Catalyst can push a lane filter into. No UDF, no shuffle.

Subset implemented (documented, not silently wrong): ``no-store``,
``no-cache``, ``max-age=N`` (first occurrence wins), and validator
presence (``ETag`` / ``Last-Modified``) for the revalidate flag.
``Expires`` fallback, ``s-maxage``, and ``stale-while-revalidate`` are
more regexp_extract conjuncts on the same projection when needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: header VALUE lift, case-insensitive on the header NAME (RFC 9110 §5.1)
_CACHE_CONTROL_RE = r"(?im)^cache-control[ \t]*:[ \t]*(.+?)[ \t]*$"
_ETAG_RE = r"(?im)^etag[ \t]*:"
_LAST_MODIFIED_RE = r"(?im)^last-modified[ \t]*:"
_MAX_AGE_RE = r"(?i)(?:^|[,\s])max-age=(\d+)"


def cache_policy(
    headers: Column | str,
    default_ttl_s: int = 86400,
) -> Column:
    """Struct ``(ttl_s int, revalidate boolean, lane string)`` for one
    response-header block.

    * ``no-store``            → ttl 0,   revalidate false, lane 'no_store'
      (the response may not be reused at all — full refetch each visit)
    * ``no-cache`` / max-age=0 → ttl 0, revalidate = has validator,
      lane 'revalidate' (conditional GET: 304s are ~free)
    * ``max-age=N``           → ttl N, revalidate = has validator,
      lane 'hourly' (N ≤ 3600) / 'daily' (N ≤ 86400) / 'weekly'
    * no caching headers      → ttl ``default_ttl_s``, lane 'default'
    """
    h = F.col(headers) if isinstance(headers, str) else headers
    cc = F.lower(F.regexp_extract(h, _CACHE_CONTROL_RE, 1))
    max_age_txt = F.regexp_extract(cc, _MAX_AGE_RE, 1)
    max_age = F.when(max_age_txt != "", max_age_txt.cast("int"))
    no_store = cc.contains("no-store")
    # RFC 9111: "no-cache" the directive, not the substring of "no-cache=..."
    # — contains() is fine because any form forces revalidation
    no_cache = cc.contains("no-cache")
    has_validator = h.rlike(_ETAG_RE) | h.rlike(_LAST_MODIFIED_RE)

    ttl = (
        F.when(no_store, F.lit(0))
        .when(no_cache, F.lit(0))
        .when(max_age.isNotNull(), max_age)
        .otherwise(F.lit(int(default_ttl_s)))
        .cast("int")
    )
    revalidate = F.when(no_store, F.lit(False)).otherwise(has_validator)
    lane = (
        F.when(no_store, F.lit("no_store"))
        .when(no_cache | (max_age == 0), F.lit("revalidate"))
        .when(max_age <= 3600, F.lit("hourly"))
        .when(max_age <= 86400, F.lit("daily"))
        .when(max_age.isNotNull(), F.lit("weekly"))
        .otherwise(F.lit("default"))
    )
    return F.struct(ttl.alias("ttl_s"), revalidate.alias("revalidate"),
                    lane.alias("lane"))


#: charset= parameter of a Content-Type header value (RFC 9110 §8.3),
#: optionally quoted
_CT_CHARSET_RE = r"(?im)^content-type[ \t]*:[^\n]*?charset=\"?([A-Za-z0-9_\-]+)"
#: HTML meta fallbacks: <meta charset=...> and the http-equiv form
_META_CHARSET_RE = r"(?is)<meta[^>]*\bcharset=[\"']?([A-Za-z0-9_\-]+)"


def detect_charset(
    headers: Column | str,
    body: Column | str | None = None,
    default: str = "utf-8",
) -> Column:
    """Charset of a response, by the protocol's precedence: the
    Content-Type header's ``charset`` parameter wins; else the document's
    ``<meta charset>`` / ``http-equiv`` declaration; else ``default``.
    Lowercased; never NULL. Pure regex projection — the decode step this
    feeds (bytes → text) runs in the fetch path's Arrow batches, and a
    wrong charset must surface as one mojibake row, not a task failure.
    """
    h = F.col(headers) if isinstance(headers, str) else headers
    out = F.lower(F.regexp_extract(h, _CT_CHARSET_RE, 1))
    if body is not None:
        b = F.col(body) if isinstance(body, str) else body
        meta = F.lower(F.regexp_extract(b, _META_CHARSET_RE, 1))
        out = F.when(out != "", out).otherwise(meta)
    return F.when(out != "", out).otherwise(F.lit(default.lower()))
