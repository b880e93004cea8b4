"""Sitemap ingest — the web-scale analogue of the reference's listing scan.

The reference discovers its work items by walking a paginated HTML listing
(contract_crawler.py:316-325, :134-153); a production crawler's equivalent
structured discovery feed is the sitemap protocol (sitemaps.org): per-domain
``<urlset>`` documents of ``<url><loc/><lastmod/><changefreq/><priority/>``
entries, optionally nested one level under a ``<sitemapindex>`` of child
sitemap locations.

Spark-first shape: the sitemap documents arrive as ONE string column on a
DataFrame (one row per fetched sitemap — the fetch itself is the engine's
normal fetch path; this module is the parse stage). Parsing is entirely
JVM-side built-ins — ``regexp_extract_all`` to lift the entry blocks,
``explode`` to fan out, per-field ``regexp_extract`` projections — no Python
UDF anywhere, so the whole stage is a codegen'd projection that scales as a
pure map: zero shuffles, and the per-row work is bounded by the protocol
itself (a sitemap file may carry at most 50 000 URLs / 50 MB uncompressed,
so a single row can never become a straggler at 10^10-URL scale).

Caveats (documented, not silently wrong): entity-escaped locs are unescaped
for the five predefined XML entities; CDATA sections are not supported
(raise-by-absence: a CDATA loc simply fails the ``<loc>`` text match and
yields no row, it never yields a corrupt URL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: entry blocks inside a urlset / index document ((?s): sitemaps are
#: routinely pretty-printed across lines)
_URL_BLOCK_RE = r"(?s)<url\b[^>]*>(.*?)</url>"
_SITEMAP_BLOCK_RE = r"(?s)<sitemap\b[^>]*>(.*?)</sitemap>"

#: per-field extracts, run on one entry block (group 1 = trimmed text)
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ_RE = r"(?s)<changefreq>\s*(.*?)\s*</changefreq>"
_PRIORITY_RE = r"(?s)<priority>\s*(.*?)\s*</priority>"


def xml_unescape(col: Column) -> Column:
    """Undo the five predefined XML entities (sitemap spec requires locs to
    be entity-escaped). ``&amp;`` is decoded LAST so ``&amp;lt;`` round-trips
    to the literal text ``&lt;`` rather than double-decoding to ``<``."""
    out = col
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _text_or_null(block: Column, pattern: str) -> Column:
    got = F.regexp_extract(block, pattern, 1)
    return F.when(got != "", got)


def parse_sitemap_entries(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("sitemap_url",),
    default_priority: float = 0.5,
) -> DataFrame:
    """One row per ``<url>`` entry: (keep_cols..., loc, lastmod, changefreq,
    priority). ``priority`` defaults to the spec's 0.5 when the element is
    absent or non-numeric; ``lastmod``/``changefreq`` stay NULL when absent.

    Entries with no parseable ``<loc>`` are dropped (the spec makes loc
    mandatory) — ``explode`` of the block array plus a null filter, so a
    malformed entry costs one filtered row, never a task failure.
    """
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), 1)
    exploded = sitemaps.select(
        *keep_cols, F.explode(blocks).alias("_block")
    )
    block = F.col("_block")
    prio_txt = _text_or_null(block, _PRIORITY_RE)
    return (
        exploded.select(
            *keep_cols,
            xml_unescape(_text_or_null(block, _LOC_RE)).alias("loc"),
            _text_or_null(block, _LASTMOD_RE).alias("lastmod"),
            _text_or_null(block, _CHANGEFREQ_RE).alias("changefreq"),
            F.coalesce(
                F.when(prio_txt.rlike(r"^[0-9]*\.?[0-9]+$"),
                       prio_txt.cast("double")),
                F.lit(float(default_priority)),
            ).alias("priority"),
        )
        .where(F.col("loc").isNotNull())
    )


def expand_sitemap_index(
    index_docs: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("sitemap_url",),
) -> DataFrame:
    """One row per child ``<sitemap><loc>`` of a ``<sitemapindex>``:
    (keep_cols..., child_url, child_lastmod). The caller feeds child_url back
    through the engine's fetch path and the fetched bodies through
    :func:`parse_sitemap_entries` — one bounded level of nesting, exactly the
    protocol's own recursion depth."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_SITEMAP_BLOCK_RE), 1)
    block = F.col("_block")
    return (
        index_docs.select(*keep_cols, F.explode(blocks).alias("_block"))
        .select(
            *keep_cols,
            xml_unescape(_text_or_null(block, _LOC_RE)).alias("child_url"),
            _text_or_null(block, _LASTMOD_RE).alias("child_lastmod"),
        )
        .where(F.col("child_url").isNotNull())
    )


#: RFC 9309 §2.3 / sitemaps.org: "Sitemap:" is a group-independent robots
#: directive, matched case-insensitively anywhere in the file
_ROBOTS_SITEMAP_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)[ \t]*$"


def robots_sitemap_directives(
    robots: DataFrame,
    body_col: str = "body",
    keep_cols: tuple[str, ...] = ("domain",),
) -> DataFrame:
    """One row per ``Sitemap:`` directive found in a robots.txt body:
    (keep_cols..., sitemap_url). This is where sitemap DISCOVERY starts —
    the crawler already fetches robots.txt per domain for the politeness
    dim (operators/robots.py acquire_robots); the same bodies, run through
    this projection, seed :func:`expand_sitemap_index` /
    :func:`parse_sitemap_entries` with zero extra fetches.

    The directive is group-independent (valid anywhere in the file, any
    case, per sitemaps.org and RFC 9309 §2.3), hence one multiline
    case-insensitive lift instead of the user-agent group-tracking parse
    that Disallow needs. Pure codegen projection: regexp_extract_all +
    explode, no UDF, no shuffle.
    """
    urls = F.regexp_extract_all(F.col(body_col), F.lit(_ROBOTS_SITEMAP_RE), 1)
    return robots.select(*keep_cols, F.explode(urls).alias("sitemap_url"))


def sitemap_diff(
    old_entries: DataFrame,
    new_entries: DataFrame,
    key_col: str = "loc",
    cmp_col: str = "lastmod",
) -> DataFrame:
    """Snapshot-over-snapshot sitemap delta: one row per URL whose state
    changed between two parses of the same sitemap universe —
    ``(loc, change 'added'|'removed'|'changed', old_lastmod, new_lastmod)``.
    Unchanged URLs (same loc, null-safe-equal ``cmp_col``) are dropped:
    the output feeds the recrawl frontier, and unchanged is the no-op lane.

    This is the polling crawler's cheapest change feed: two sitemap fetches
    per domain bound the whole diff, however large the site. Shape: ONE
    full-outer hash join on the URL key — both sides pre-projected to
    (key, cmp), co-partitioned by the join itself; no window, no second
    exchange. At 10^10 URLs the join keys are the sitemap universe, already
    orders of magnitude under the crawl log.
    """
    o = old_entries.select(F.col(key_col).alias("_k"),
                           F.col(cmp_col).alias("old_" + cmp_col))
    n = new_entries.select(F.col(key_col).alias("_k"),
                           F.col(cmp_col).alias("new_" + cmp_col))
    oc, nc = F.col("old_" + cmp_col), F.col("new_" + cmp_col)
    # presence flags survive the outer join even when cmp_col is NULL
    o = o.withColumn("_in_old", F.lit(True))
    n = n.withColumn("_in_new", F.lit(True))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~oc.eqNullSafe(nc), F.lit("changed"))
    )
    return (
        o.join(n, on="_k", how="full_outer")
        .select(F.col("_k").alias(key_col), change.alias("change"),
                "old_" + cmp_col, "new_" + cmp_col)
        .where(F.col("change").isNotNull())
    )


def sitemap_to_frontier(entries: DataFrame) -> DataFrame:
    """Project parsed entries to frontier-seed shape: (url, priority, depth).

    Sitemap priority (0..1) maps straight onto the frontier's priority axis;
    lastmod recency is the natural tiebreak, encoded as a fractional bonus so
    equal-priority URLs fetch newest-first under the engine's canonical
    (priority DESC, next-fetch-time ASC) ordering."""
    recency = F.coalesce(
        F.unix_timestamp(F.to_timestamp("lastmod")).cast("double")
        / F.lit(4102444800.0),  # 2100-01-01 — keeps the bonus strictly < 1
        F.lit(0.0),
    )
    return entries.select(
        F.col("loc").alias("url"),
        (F.col("priority") + recency / 1000.0).alias("priority"),
        F.lit(0).alias("depth"),
    )
