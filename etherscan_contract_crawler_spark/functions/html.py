"""HTML → text extraction — pure Column regex chain (no parser library).

The reference extracts fields from fetched pages with bs4 selectors
(contract_crawler.py:134-153); the listing source (sources/listing.py)
generalizes the field lift. This module is the other standard consumer of
a landed page: flatten the whole document to indexable text for the
curation layer (language-ID, quality, dedup all run on it).

Regex-on-HTML caveats, stated not hidden: this is the WHOLE-DOCUMENT
flatten, not a DOM query — good for "the text of the page", wrong for
"the third table cell" (that's the listing source's job). Every pattern is
RE2-safe (no backreferences, no lookaround) so the SAME chain runs in the
DuckDB oracle; script/style need separate removals because ``</\\1>``
backreferences don't exist in RE2.

Scale: a scan-level projection — a handful of regexp_replace passes per
row, cost linear in page size, zero shuffles, full codegen. At 100 TB
this runs at scan speed next to the landing read.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: removal passes, in order (comments first: a commented-out script must
#: not resurrect; script/style whole-block because their CONTENT is code)
_STRIP_PASSES = (
    r"(?s)<!--.*?-->",
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?s)<[^>]*>",  # every remaining tag -> separator
)
_TITLE_RE = r"(?is)<title[^>]*>\s*(.*?)\s*</title"

#: the five predefined XML entities plus the one HTML adds everywhere
_ENTITIES = (
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
)


def html_unescape(col: Column) -> Column:
    """Entity decode (named subset + nbsp); ``&amp;`` last so ``&amp;lt;``
    round-trips to literal ``&lt;`` instead of double-decoding."""
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML document: comments, scripts, styles and tags
    removed (tags become spaces so adjacent blocks don't weld together),
    entities decoded, whitespace collapsed, trimmed."""
    out = F.col(col) if isinstance(col, str) else col
    for pat in _STRIP_PASSES:
        out = F.regexp_replace(out, pat, " ")
    out = html_unescape(out)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_title(col: Column | str) -> Column:
    """``<title>`` text (entity-decoded, trimmed); NULL when absent."""
    c = F.col(col) if isinstance(col, str) else col
    got = F.regexp_extract(c, _TITLE_RE, 1)
    return F.when(got != "", html_unescape(got))


#: X-Robots-Tag response header (RFC 9110 field syntax; value to line end)
_XROBOTS_RE = r"(?im)^x-robots-tag\s*:\s*([^\r\n]*)"
#: first <meta name=robots ...> tag, attribute order free
_META_ROBOTS_TAG_RE = (
    r"(?is)<meta\b[^>]*\bname\s*=\s*[\"']?robots[\"']?[^>]*>"
)
_CONTENT_ATTR_RE = r"(?is)\bcontent\s*=\s*[\"']([^\"']*)[\"']"


def _directive(directives: Column, name: str) -> Column:
    # token match inside a comma-separated directive list ('none' implies
    # both noindex and nofollow, per the robots-meta spec)
    pat = rf"(?i)(^|,)\s*({name}|none)\s*(,|$)"
    return directives.rlike(pat)


def meta_robots(headers: Column | str, body: Column | str) -> Column:
    """Page-level robots directives as a struct
    ``(noindex boolean, nofollow boolean)``.

    robots.txt (operators/robots.py) gates the FETCH; these gate what a
    crawler may do with a page it already fetched: ``noindex`` keeps the
    document out of the corpus/index, ``nofollow`` keeps its outlinks out
    of the frontier. Sources, per the robots-meta spec: the
    ``X-Robots-Tag`` response header and ``<meta name="robots">`` — both
    apply, most-restrictive wins (directive union), ``none`` ≡
    ``noindex,nofollow``. Case-insensitive token match on the
    comma-separated directive list; a directive buried in another word
    (``nonoindexed``) does not match.

    Pure Column regex projection (RE2-safe, zero shuffle, codegen) — runs
    at scan speed next to the landing read, and the ``~noindex`` /
    ``~nofollow`` predicates it feeds are plain Catalyst filters on the
    corpus-admission and link-extraction paths.

    Reference analog: none — the reference indexes everything it fetches
    (contract_crawler.py:134-153); at web scale ignoring these directives
    both bloats the corpus and violates publisher opt-outs.
    """
    h = F.col(headers) if isinstance(headers, str) else headers
    b = F.col(body) if isinstance(body, str) else body
    hdr = F.regexp_extract(h, _XROBOTS_RE, 1)
    tag = F.regexp_extract(b, _META_ROBOTS_TAG_RE, 0)
    meta = F.regexp_extract(tag, _CONTENT_ATTR_RE, 1)
    combined = F.concat_ws(",", hdr, meta)
    return F.struct(
        _directive(combined, "noindex").alias("noindex"),
        _directive(combined, "nofollow").alias("nofollow"),
    )


#: <link ... rel=canonical ... href=...> — two orderings, RE2-safe (no
#: backrefs): quoted or bare attribute values, case-insensitive.
_CANONICAL_REL_HREF_RE = (
    r"(?i)<link\b[^>]*\brel\s*=\s*['\"]?canonical['\"]?[^>]*"
    r"\bhref\s*=\s*['\"]?([^'\"\s>]+)"
)
_CANONICAL_HREF_REL_RE = (
    r"(?i)<link\b[^>]*\bhref\s*=\s*['\"]?([^'\"\s>]+)['\"]?[^>]*"
    r"\brel\s*=\s*['\"]?canonical"
)


def rel_canonical(body: Column | str, page_url: Column | str) -> Column:
    """``<link rel="canonical">`` target as a struct
    ``(canonical_url string, is_self boolean)``.

    The canonical link is the publisher's own dedup signal: pages that
    declare a DIFFERENT canonical are duplicates by assertion — a crawler
    credits content to the canonical URL and can skip indexing the
    duplicate without any content comparison (the zero-cost first tier
    above checksum/minhash dedup). Attribute order free (rel before or
    after href), case-insensitive, single/double/no quotes;
    ``canonical_url`` is NULL when the page declares none (or only decoy
    ``<link>`` tags). ``is_self`` compares both sides AFTER
    canonicalize_url, so trivial self-references (scheme/host case,
    default port) don't masquerade as cross-URL duplicates; it is NULL
    when no canonical is declared.

    Pure Column regex projection (RE2-safe — two fixed orderings instead
    of backrefs — zero shuffle, codegen), same scan-speed contract as
    meta_robots.
    """
    from .urls import canonicalize_url

    b = F.col(body) if isinstance(body, str) else body
    u = F.col(page_url) if isinstance(page_url, str) else page_url
    href1 = F.regexp_extract(b, _CANONICAL_REL_HREF_RE, 1)
    href2 = F.regexp_extract(b, _CANONICAL_HREF_REL_RE, 1)
    href = F.when(href1 != "", href1).when(href2 != "", href2)
    canon = canonicalize_url(href)
    return F.struct(
        href.alias("canonical_url"),
        F.when(
            href.isNotNull(), canon == canonicalize_url(u)
        ).alias("is_self"),
    )


_HREFLANG_TAG_RE = r"(?is)<link\b[^>]*>"
_HREFLANG_ATTR_RE = r"""(?i)\bhreflang\s*=\s*["']?([A-Za-z][A-Za-z-]*)"""
_HREF_ATTR_RE = r"""(?i)\bhref\s*=\s*["']?([^"'\s>]+)"""
_REL_ALTERNATE_RE = r"""(?i)\brel\s*=\s*["']?alternate"""


def hreflang_alternates(body: Column | str) -> Column:
    """All ``<link rel="alternate" hreflang="..">`` language variants of a
    page as ``array<struct<lang string, href string>>``.

    hreflang clusters are the publisher's own multilingual dedup signal: a
    crawler that knows /p/1?lang=de is the German variant of /p/1 can (a)
    skip re-crawling variants when targeting one language and (b) group
    variants for caption/text alignment instead of treating them as
    near-dup noise. Attribute order free, single/double/no quotes,
    case-insensitive; ``lang`` is lowercased (BCP 47 tags are
    case-insensitive); tags carrying hreflang without ``rel=alternate``
    (decoys) and alternate links without hreflang (RSS feeds) are ignored.

    Pure Column projection (regexp_extract_all + transform/filter — all
    RE2-safe, zero shuffle, scan-speed), same contract as rel_canonical.
    """
    b = F.col(body) if isinstance(body, str) else body
    tags = F.regexp_extract_all(b, F.lit(_HREFLANG_TAG_RE), F.lit(0))
    alts = F.filter(
        tags,
        lambda t: t.rlike(_REL_ALTERNATE_RE)
        & (F.regexp_extract(t, _HREFLANG_ATTR_RE, 1) != "")
        & (F.regexp_extract(t, _HREF_ATTR_RE, 1) != ""),
    )
    return F.transform(
        alts,
        lambda t: F.struct(
            F.lower(F.regexp_extract(t, _HREFLANG_ATTR_RE, 1)).alias("lang"),
            F.regexp_extract(t, _HREF_ATTR_RE, 1).alias("href"),
        ),
    )


_IMG_TAG_RE = r"(?i)<img\b[^>]*>"
#: attribute starts are \s-anchored, not \b-anchored: RE2 (the oracle
#: engine) has no lookbehind, and \bsrc= would also fire inside the
#: lazy-loading data-src= ('-' is a word boundary) — \s keeps plain and
#: data- attributes distinct in both engines
_SRC_ATTR_RE = r"""(?i)\ssrc\s*=\s*["']([^"']*)["']"""
_DATA_SRC_RE = r"""(?i)\sdata-src\s*=\s*["']([^"']*)["']"""
_ALT_DQ_RE = r'(?i)\salt\s*=\s*"([^"]*)"'
_ALT_SQ_RE = r"(?i)\salt\s*=\s*'([^']*)'"
_SRCSET_ATTR_RE = r'(?i)\ssrcset\s*=\s*"([^"]*)"'
_DATA_SRCSET_RE = r'(?i)\sdata-srcset\s*=\s*"([^"]*)"'
_IMG_CAND_T = (
    "array<struct<img_idx:int,url:string,descr:string,"
    "alt:string,from_srcset:boolean>>"
)


def img_candidates(body: Column | str) -> Column:
    """Image-text pair harvesting — the LAION/CommonPool construction
    primitive: every ``<img>`` tag yields one candidate per source (the
    bare ``src`` as the HTML-spec ``1x`` default, plus each ``srcset``
    entry with its density/width descriptor), each carrying the tag's
    ``alt`` text (double- or single-quoted; absent/empty → NULL).

    Returns ``array<struct<img_idx, url, descr, alt, from_srcset>>``
    (``img_idx`` 1-based in document order) for the caller to explode
    next to doc_id/page_url. Quoted attribute values only (the regex
    flatten contract of this module); all patterns RE2-safe so the
    DuckDB oracle runs the same chain.

    Pure Column projection — regexp_extract_all + nested transform,
    zero shuffles until the caller's explode (a Generate, still no
    exchange); at 100 TB this is a scan-speed pass over landed HTML.
    """
    b = F.col(body) if isinstance(body, str) else body
    tags = F.regexp_extract_all(b, F.lit(_IMG_TAG_RE), F.lit(0))
    empty = F.array().cast(
        "array<struct<url:string,descr:string,from_srcset:boolean>>"
    )

    def per_tag(t, i):
        # lazy-loading fallback: a tag without src/srcset but with
        # data-src/data-srcset (the common lazy-loader contract) yields
        # its deferred sources; real attributes win when both exist
        src_plain = F.regexp_extract(t, _SRC_ATTR_RE, 1)
        src_lazy = F.regexp_extract(t, _DATA_SRC_RE, 1)
        src = F.when(src_plain != "", src_plain).otherwise(src_lazy)
        alt_dq = F.regexp_extract(t, _ALT_DQ_RE, 1)
        alt_sq = F.regexp_extract(t, _ALT_SQ_RE, 1)
        alt = (
            F.when(alt_dq != "", alt_dq)
            .when(alt_sq != "", alt_sq)
            .otherwise(F.lit(None).cast("string"))
        )
        srcset_plain = F.regexp_extract(t, _SRCSET_ATTR_RE, 1)
        srcset_lazy = F.regexp_extract(t, _DATA_SRCSET_RE, 1)
        srcset = F.when(srcset_plain != "", srcset_plain).otherwise(
            srcset_lazy
        )

        def srcset_entry(c):
            parts = F.split(F.trim(c), r"\s+")
            return F.struct(
                F.get(parts, 0).alias("url"),
                F.coalesce(F.get(parts, 1), F.lit("1x")).alias("descr"),
                F.lit(True).alias("from_srcset"),
            )

        cands = F.concat(
            F.when(
                src != "",
                F.array(F.struct(
                    src.alias("url"),
                    F.lit("1x").alias("descr"),
                    F.lit(False).alias("from_srcset"),
                )),
            ).otherwise(empty),
            F.when(
                srcset != "",
                F.transform(F.split(srcset, ","), srcset_entry),
            ).otherwise(empty),
        )
        return F.transform(
            cands,
            lambda c: F.struct(
                (i + 1).cast("int").alias("img_idx"),
                c["url"].alias("url"),
                c["descr"].alias("descr"),
                alt.alias("alt"),
                c["from_srcset"].alias("from_srcset"),
            ),
        )

    return F.flatten(F.transform(tags, per_tag)).cast(_IMG_CAND_T)


_A_TAG_RE = r"(?i)<a\s[^>]*>[^<]*</a>"
_A_OPEN_RE = r"(?i)^<a\s[^>]*>"
_HREF_DQ_RE = r'(?i)\shref\s*=\s*"([^"]*)"'
_HREF_SQ_RE = r"(?i)\shref\s*=\s*'([^']*)'"
_REL_DQ_RE = r'(?i)\srel\s*=\s*"([^"]*)"'
_REL_SQ_RE = r"(?i)\srel\s*=\s*'([^']*)'"
_A_TEXT_RE = r"(?i)>([^<]*)</a>"
_NOFOLLOW_TOKEN_RE = r"(?i)(^|[\s,])nofollow([\s,]|$)"
_A_CAND_T = "array<struct<a_idx:int,href:string,text:string,nofollow:boolean>>"


def a_candidates(body: Column | str) -> Column:
    """Outlink harvesting — the crawl's discovery primitive: every
    plain-text ``<a>`` element yields (href, anchor text, nofollow flag).

    The fuel for the whole frontier side of this engine: hrefs feed
    canonicalize_url → url_seen dedup → scheduling; anchor texts feed
    anchor_text_agg's per-target description signal; ``nofollow``
    (rel-attr token match per the spec: comma- or space-separated token
    list, never substring — ``nofollower`` does not count) feeds the link
    graph's edge filter next to meta_robots' page-level flag. The
    reference does its equivalent with BeautifulSoup row-at-a-time
    (contract_crawler.py:142-145); this is the vectorized Column chain.

    Contract (matches this module's regex-flatten rules): plain-text
    anchors only (``[^<]*`` inner — an anchor wrapping nested markup is
    skipped, not mis-parsed), quoted or unquoted-free attribute values as
    quoted only, patterns RE2-safe so the DuckDB oracle runs the same
    chain. Anchors without an href (named anchors) are dropped.

    Returns ``array<struct<a_idx, href, text, nofollow>>`` (``a_idx``
    1-based in document order, counting only kept anchors). Pure Column
    projection — zero shuffles until the caller's explode.
    """
    b = F.col(body) if isinstance(body, str) else body
    tags = F.regexp_extract_all(b, F.lit(_A_TAG_RE), F.lit(0))

    def per_tag(t):
        # Attribute regexes run on the OPENING TAG only (r4 ADVICE): anchor
        # TEXT containing a literal href="..."/rel="..." must not override
        # the real attribute (the dq-over-sq preference would otherwise let
        # a double-quoted lookalike in the text beat a single-quoted real
        # attribute).  The oracle mirrors this same head-extract.
        head = F.regexp_extract(t, _A_OPEN_RE, 0)
        href_dq = F.regexp_extract(head, _HREF_DQ_RE, 1)
        href_sq = F.regexp_extract(head, _HREF_SQ_RE, 1)
        href = F.when(href_dq != "", href_dq).otherwise(href_sq)
        rel_dq = F.regexp_extract(head, _REL_DQ_RE, 1)
        rel_sq = F.regexp_extract(head, _REL_SQ_RE, 1)
        rel = F.when(rel_dq != "", rel_dq).otherwise(rel_sq)
        return F.struct(
            href.alias("href"),
            F.regexp_extract(t, _A_TEXT_RE, 1).alias("text"),
            rel.rlike(_NOFOLLOW_TOKEN_RE).alias("nofollow"),
        )

    kept = F.filter(
        F.transform(tags, per_tag), lambda c: c["href"] != F.lit("")
    )
    return F.transform(
        kept,
        lambda c, i: F.struct(
            (i + 1).cast("int").alias("a_idx"),
            c["href"].alias("href"),
            c["text"].alias("text"),
            c["nofollow"].alias("nofollow"),
        ),
    ).cast(_A_CAND_T)
