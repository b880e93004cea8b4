"""Reference-semantics oracle — single-process, row-at-a-time, like the
reference itself (contract_crawler.py's sequential loop), reimplementing only
OBSERVABLE semantics (SURVEY.md §5.2):

  * seed ingest: one key column, lowercase/canonicalize, set-collapse
    (contract_crawler.py:358-362, :420);
  * validity filter: invalid keys logged+skipped, never fetched (:472-474);
  * dedup-before-fetch: seen keys removed before any fetch (:466-468);
  * crawl ordering: the reference's CSV path iterates a hash-ordered Python
    set (:468-471 — nondeterministic, SURVEY.md §8 B4), so parity pins the
    canonical order (priority DESC, next_fetch_time ASC, url_sha1 ASC);
  * politeness budget: the INTENDED 5 calls/period limit (:372-375, dead
    code §8 B1) enforced per domain per epoch;
  * mark-at-attempt checkpointing: every attempted key becomes seen whether
    the fetch succeeded or not (:488-490, K5);
  * retry-then-dead-letter: 3 retries inside the attempt (:134, :147-153).

The oracle and the engine share ONLY the deterministic fetch-outcome and
payload generators (sources/synthetic.py) — the control flow here is written
independently, against the reference's semantics, not against the engine.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit

from ..sources.synthetic import fetch_outcome

ETH_ADDRESS_RE = re.compile(r"^0x[a-fA-F0-9]{40}$")


def canonicalize_url_py(url: str) -> str:
    """Must agree byte-for-byte with functions.urls.canonicalize_url."""
    u = url.strip().split("#", 1)[0]
    parts = urlsplit(u)
    proto = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port is not None and not (
        (proto == "http" and port == 80) or (proto == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = parts.path or "/"
    query = ""
    if parts.query:
        query = "?" + "&".join(sorted(parts.query.split("&")))
    return f"{proto}://{host}{path}{query}"


def registrable_domain_py(url: str) -> str:
    """Pure-python PSL oracle — same rule sets and algorithm as the Spark
    expression (functions/psl.py): exceptions beat wildcards beat exact,
    longest match wins, default rule '*'."""
    from ..functions.psl import PSL_EXACT, PSL_EXCEPTIONS, PSL_WILDCARD

    host = (urlsplit(url.strip().split("#", 1)[0]).hostname or "").lower()
    labels = host.split(".")
    n = len(labels)
    if n <= 1:
        return host
    suffix_len = 1
    for k in (2, 3):
        if n > k and (
            ".".join(labels[-k:]) in PSL_EXACT
            or ".".join(labels[-(k - 1):]) in PSL_WILDCARD
        ):
            suffix_len = k
    for exc in PSL_EXCEPTIONS:
        k = exc.count(".") + 1
        if n >= k and ".".join(labels[-k:]) == exc:
            suffix_len = k - 1
    if n <= suffix_len:
        return host
    return ".".join(labels[-(suffix_len + 1):])


def url_key_py(url: str) -> str:
    return url.split("/")[-1].split("#")[0]


def sha1_py(s: str) -> str:
    return hashlib.sha1(s.encode()).hexdigest()


@dataclass
class OracleResult:
    epochs: list[list[str]] = field(default_factory=list)  # ordered url_sha1 per epoch
    seen: set[str] = field(default_factory=set)
    images: set[str] = field(default_factory=set)
    dead: set[str] = field(default_factory=set)
    rejected: int = 0


def ingest(seed_rows: list[dict]) -> tuple[dict[str, dict], int]:
    """Returns ({url_sha1: frontier row}, n_rejected)."""
    frontier: dict[str, dict] = {}
    rejected = 0
    for r in seed_rows:
        key = url_key_py(r["url"])
        if not ETH_ADDRESS_RE.match(key):
            rejected += 1
            continue
        canon = canonicalize_url_py(r["url"])
        sha = sha1_py(canon)
        if sha in frontier:
            f = frontier[sha]
            f["priority"] = max(f["priority"], r["priority"])
            f["url"] = min(f["url"], r["url"])
        else:
            frontier[sha] = {
                "url": r["url"],
                "url_canon": canon,
                "url_sha1": sha,
                "domain": registrable_domain_py(r["url"]),
                "priority": r["priority"],
            }
    return frontier, rejected


def expand_child(sha: str, domain: str) -> dict | None:
    """Mirror of CrawlEngine._expand_frontier's deterministic link rule."""
    if int(sha[:8], 16) % 5 != 0:
        return None
    child_key = sha1_py(sha + "c1")
    url = f"https://{domain}/address/0x{child_key}#code"
    priority = (int(child_key[:6], 16) % 1000) / 1000.0
    canon = canonicalize_url_py(url)
    return {
        "url": url,
        "url_canon": canon,
        "url_sha1": sha1_py(canon),
        "domain": registrable_domain_py(url),
        "priority": priority,
    }


def run_oracle(
    seed_rows: list[dict],
    max_calls: int = 5,
    period_s: int = 1,
    epoch_duration_s: int = 60,
    batch_size: int | None = None,
    max_retries: int = 3,
    max_epochs: int = 100,
    budgets: dict[str, tuple[int, int]] | None = None,
    robots_disallow: dict[str, list[str]] | None = None,
    expand_links: bool = False,
) -> OracleResult:
    frontier, rejected = ingest(seed_rows)
    res = OracleResult(rejected=rejected)
    capacity_of = lambda d: (
        (budgets or {}).get(d, (max_calls, period_s))[0]
        * (epoch_duration_s // (budgets or {}).get(d, (max_calls, period_s))[1])
    )

    for _ in range(max_epochs):
        pending = [f for s, f in frontier.items() if s not in res.seen]
        if robots_disallow:
            def allowed(f):
                prefixes = robots_disallow.get(f["domain"], [])
                path = canonicalize_url_py(f["url"]).split("://", 1)[1]
                path = "/" + path.split("/", 1)[1] if "/" in path else "/"
                return not any(path.startswith(p) for p in prefixes)
            pending = [f for f in pending if allowed(f)]
        order_key = lambda f: (-f["priority"], f["url_sha1"])  # nft constant at ingest
        by_domain: dict[str, list] = {}
        for f in sorted(pending, key=order_key):
            by_domain.setdefault(f["domain"], []).append(f)
        admitted = []
        for d, fs in by_domain.items():
            admitted.extend(fs[: capacity_of(d)])
        admitted.sort(key=order_key)
        if batch_size is not None:
            admitted = admitted[:batch_size]
        if not admitted:
            break
        epoch_seq = [f["url_sha1"] for f in admitted]
        res.epochs.append(epoch_seq)
        discovered = []
        for f in admitted:
            sha = f["url_sha1"]
            res.seen.add(sha)  # mark-at-attempt (K5)
            outcome = None
            for attempt in range(max_retries + 1):
                outcome = fetch_outcome(sha, attempt)
                if outcome == "ok":
                    break
            if outcome == "ok":
                res.images.add(sha)
                if expand_links:
                    c = expand_child(sha, f["domain"])
                    if c is not None:
                        discovered.append(c)
            else:
                res.dead.add(sha)
        for c in discovered:
            s = c["url_sha1"]
            if s in frontier:  # same max-priority/min-url collapse as ingest
                frontier[s]["priority"] = max(frontier[s]["priority"], c["priority"])
                frontier[s]["url"] = min(frontier[s]["url"], c["url"])
            else:
                frontier[s] = c
    return res
