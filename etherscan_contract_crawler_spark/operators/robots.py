"""Robots.txt acquisition — fills the politeness robots dim (r1 VERDICT #10).

Round 1 shipped only the *filter* (operators/politeness.py robots_filter — a
broadcast dim join + higher-order ``exists``); this module produces that dim:
one fetch of ``https://{domain}/robots.txt`` per distinct frontier domain
through the SAME injected-fetcher ``mapInPandas`` harness as the page fetch
(operators/fetch.py — per-task session prologue, Arrow batches), then a
minimal RFC 9309 parse into ``(domain, disallow array<string>)``.

Scale shape: the input is ``distinct(domain)`` — orders of magnitude smaller
than the frontier (one row per registrable domain), so the per-row parse
inside the Arrow batch is nowhere near any hot path; the output dim is
broadcast by robots_filter. Parsing keeps only the ``User-agent: *`` group's
``Disallow`` prefixes (non-empty), the subset the reference-scale crawler
enforces; Allow/crawl-delay extensions would be more columns on the same dim.

Reference analog: none — the reference crawls three hardcoded sites with no
robots handling (contract_crawler.py:32-36); the north_star's "robots cache"
demands it.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

ROBOTS_DDL = (
    "domain string, disallow array<string>, allow array<string>, "
    "crawl_delay double"
)

RobotsFetchFn = Callable[[str], str | None]
"""domain -> robots.txt body (None = unreachable/404 -> no rules)."""


def parse_robots_full(
    body: str | None,
) -> tuple[list[str], list[str], float | None]:
    """Minimal RFC 9309 parse of the ``User-agent: *`` group(s):
    ``(disallow_rules, allow_rules, crawl_delay_seconds | None)``.
    Comments stripped, empty Disallow/Allow (no-op) ignored, unknown
    directives skipped, non-numeric/negative Crawl-delay ignored (last
    valid one in a ``*`` group wins). Rules are kept VERBATIM —
    including ``*`` (any octets) and terminal ``$`` (end anchor) —
    and matched with full RFC 9309 wildcard semantics by
    ``politeness.robots_filter``; rule specificity stays the raw
    rule's octet length. Pure function — unit-testable without
    Spark."""
    if not body:
        return [], [], None
    rules: list[str] = []
    allows: list[str] = []
    delay: float | None = None
    in_star_group = False
    seen_agent_line = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            # consecutive user-agent lines share one group; a directive line
            # closes the group header
            if seen_agent_line:
                in_star_group = in_star_group or value == "*"
            else:
                in_star_group = value == "*"
            seen_agent_line = True
        else:
            seen_agent_line = False
            if key == "disallow" and in_star_group and value:
                rules.append(value)
            elif key == "allow" and in_star_group and value:
                allows.append(value)
            elif key == "crawl-delay" and in_star_group:
                try:
                    d = float(value)
                except ValueError:
                    continue
                if d >= 0:
                    delay = d
    return sorted(set(rules)), sorted(set(a for a in allows if a)), delay


def parse_robots(body: str | None) -> list[str]:
    """Disallow-only view of :func:`parse_robots_full` (historic surface)."""
    return parse_robots_full(body)[0]


def synthetic_robots_session() -> RobotsFetchFn:
    """Deterministic robots server for the sandbox (same role as the
    synthetic page fetcher): a stable subset of domains publishes a
    Disallow rule that matches part of the synthetic URL space."""
    import hashlib

    def fetch(domain: str) -> str | None:
        h = int(hashlib.sha1(domain.encode()).hexdigest()[:8], 16)
        if h % 4 == 0:
            # blocks half the synthetic URL space (/address/0x0../0x7..)
            rules = "\n".join(f"Disallow: /address/0x{x:x}" for x in range(8))
            return (
                "# synthetic robots\n"
                "User-agent: other-bot\nDisallow: /\n\n"
                f"User-agent: *\n{rules}\n"
            )
        if h % 4 == 1:
            return "User-agent: *\nDisallow:\n"  # explicit allow-all
        return None  # no robots.txt

    return fetch


def acquire_robots(
    frontier: DataFrame,
    robots_session_factory: Callable[[], RobotsFetchFn] = synthetic_robots_session,
) -> DataFrame:
    """Fetch+parse robots for every distinct domain in ``frontier``;
    returns the dim consumed by politeness.robots_filter and
    politeness.budgets_with_crawl_delay (domains with neither rules nor a
    delay are omitted — the filters' left joins treat them as allow-all)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = robots_session_factory()  # once per task (U3 harness shape)
        for pdf in batches:
            domains, rules, allows, delays = [], [], [], []
            for domain in pdf["domain"]:
                dis, alw, delay = parse_robots_full(fetch(domain))
                if dis or alw or delay is not None:
                    domains.append(domain)
                    rules.append(dis)
                    allows.append(alw)
                    delays.append(delay)
            yield pd.DataFrame(
                {"domain": domains, "disallow": rules, "allow": allows,
                 "crawl_delay": delays}
            )

    return (
        frontier.select("domain")
        .distinct()
        .mapInPandas(run, schema=ROBOTS_DDL)
    )
