"""Link-graph PageRank for frontier prioritization.

A production crawler ranks its frontier by link authority, not just seed
priority — the reference hardcodes page order (contract_crawler.py:316-325)
because its universe is one listing site; at web scale the priority column
this engine's scheduler orders by (operators/politeness.py, canonical order
``priority DESC``) needs a principled source. This module computes it:
fixed-iteration power-method PageRank over an outlink edge list, expressed
entirely in DataFrame ops so every iteration is two shuffles that Catalyst
can plan (join on src, aggregate on dst) — no RDDs, no driver-side graph.

Semantics (pinned by the SQL oracle in __spark_entry__.py):
  * simplified PageRank: ``pr = (1-d)/N + d * sum_in(pr_src / outdeg_src)``;
    dangling-node mass is dropped, not redistributed (the common
    fixed-iteration simplification — deterministic and closed-form, so an
    independent DuckDB oracle can chain the same K iterations as CTEs).
  * fixed ``iters`` (default 3), damping 0.85, uniform init 1/N over the
    node set = distinct(src) ∪ distinct(dst).

Scale notes (the 10^10-edge question):
  * the edge list is joined with ``outdeg`` ONCE up front to bake the
    per-edge weight ``1/outdeg`` — after that no per-iteration join against
    the degree table.
  * weighted edges are repartitioned by ``src`` and persisted; each
    iteration shuffles only the rank vector (nodes-sized, ≪ edges) to meet
    them, then aggregates on ``dst`` with map-side partial sums. Edges — the
    100-TB side — are shuffled exactly once for the whole run.
  * ``localCheckpoint`` per iteration keeps the lineage O(1) (same trick as
    analytics/dedup.py's label propagation); K is small and fixed, so no
    convergence loop, no driver round-trips besides the K job submissions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over ``edges(src, dst)`` (distinct edges).

    Returns ``(id, pr)`` for every node appearing as src or dst.
    """
    edges = edges.select("src", "dst").distinct()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))

    outdeg = edges.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    # bake the edge weight once: the only join that ever touches the full
    # edge list; persisted partitioned by src so iteration joins co-locate
    weighted = (
        edges.join(outdeg, on="src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition("src")
        .persist()
    )
    weighted.count()  # materialize before the loop

    base = (1.0 - damping) / n
    ranks = nodes.select("id", F.lit(1.0 / n).alias("pr"))
    for _ in range(iters):
        contrib = (
            weighted.join(ranks, on=weighted["src"] == ranks["id"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, on=nodes["id"] == contrib["dst"], how="left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))).alias(
                    "pr"
                ),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    weighted.unpersist()
    nodes.unpersist()
    return ranks


def hits(
    edges: DataFrame,
    iters: int = 2,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration HITS (hubs & authorities) over ``edges(src, dst)``.

    PageRank above scores a page by WHO links to it; HITS separates the two
    crawl-relevant roles — hub (links to good content: listing/index pages,
    the pages a crawler should re-visit to DISCOVER) and authority (linked
    from good hubs: the pages worth fetching deeply). The reference crawls
    one hub (its hardcoded listing loop, contract_crawler.py:316-325);
    at web scale the frontier needs both scores computed from the graph.

    Semantics (pinned by the SQL oracle in __spark_entry__.py):
      * init ``h = 1`` on every node; per iteration
        ``a(v) = Σ_in h(u)`` then L1-normalize, ``h(u) = Σ_out a(v)`` then
        L1-normalize. Fixed ``iters`` — closed-form, so an independent
        DuckDB oracle chains the same steps as CTEs.
      * L1 (sum) normalization, not L2: no sqrt, exactly re-derivable.

    Scale notes (same discipline as :func:`pagerank`):
      * edges — the 100-TB side — are shuffled ONCE into each of the two
        join layouts (by src for the authority step's probe, by dst for the
        hub step) and persisted; every iteration shuffles only the two
        node-sized score vectors.
      * the L1 sums are single-row aggregates broadcast back into the
        projection (crossJoin of a 1-row frame — no driver collect).
      * ``localCheckpoint`` per iteration keeps lineage O(1).
    """
    edges = edges.select("src", "dst").distinct()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    if nodes.count() == 0:
        return nodes.select(
            "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )

    by_src = edges.repartition("src").persist()
    by_dst = edges.repartition("dst").persist()
    by_src.count()
    by_dst.count()

    hubs = nodes.select("id", F.lit(1.0).alias("h"))
    auths = None
    for _ in range(iters):
        raw_a = (
            by_src.join(hubs, on=by_src["src"] == hubs["id"])
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
        )
        a_sum = raw_a.agg(F.sum("a").alias("s"))
        auths = (
            nodes.join(raw_a, on=nodes["id"] == raw_a["dst"], how="left")
            .crossJoin(F.broadcast(a_sum))
            .select(
                "id", (F.coalesce("a", F.lit(0.0)) / F.col("s")).alias("a")
            )
        )
        raw_h = (
            by_dst.join(auths, on=by_dst["dst"] == auths["id"])
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
        )
        h_sum = raw_h.agg(F.sum("h").alias("s"))
        hubs = (
            nodes.join(raw_h, on=nodes["id"] == raw_h["src"], how="left")
            .crossJoin(F.broadcast(h_sum))
            .select(
                "id", (F.coalesce("h", F.lit(0.0)) / F.col("s")).alias("h")
            )
        )
        if checkpoint:
            hubs = hubs.localCheckpoint(eager=True)
            auths = auths.localCheckpoint(eager=True)
    out = hubs.join(auths.withColumnRenamed("a", "authority"), on="id").select(
        "id", F.col("h").alias("hub"), "authority"
    )
    by_src.unpersist()
    by_dst.unpersist()
    nodes.unpersist()
    return out


def anchor_text_agg(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-graph signal.

    Search and curation pipelines describe a page by the anchor text of
    its inlinks (the reference never aggregates links at all — it walks
    one listing site). For every ``dst``: total inlinks, distinct
    sources, and the modal anchor string (ties broken lexicographically
    so the result is engine-invariant).

    Scale design: two hash aggregates on dst-derived keys plus one
    WindowGroupLimit. The per-(dst, anchor) count happens FIRST, so the
    rank window sees at most |distinct anchors per dst| rows — bounded by
    site vocabulary, not inlink count; a hub with 10^8 inlinks ranks a
    handful of rows. The literal ``rn <= 1`` conjunct plants a map-side
    Partial WindowGroupLimit below the exchange (same plan shape as
    operators/politeness.py's admission window).
    """
    dst = F.col(dst_col)
    totals = edges.groupBy(dst.alias("dst")).agg(
        F.count("*").alias("n_inlinks"),
        F.countDistinct(src_col).alias("n_srcs"),
    )
    per_anchor = edges.groupBy(
        dst.alias("dst"), F.col(anchor_col).alias("anchor")
    ).agg(F.count("*").alias("n_anchor"))
    w = Window.partitionBy("dst").orderBy(
        F.col("n_anchor").desc(), F.col("anchor")
    )
    top = (
        per_anchor.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 1)
        .select(
            "dst",
            F.col("anchor").alias("top_anchor"),
            F.col("n_anchor").alias("top_anchor_n"),
        )
    )
    return totals.join(top, "dst")


def host_fanin(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """In-link authority prior per destination host: the number of DISTINCT
    referring hosts, plus a log-damped prior for frontier priority boosts
    (crawlers seed per-domain budgets from exactly this signal — a cheap
    stand-in for PageRank that needs no iteration).

    Output: (dst, fanin, prior) with prior = round(ln(1 + fanin), 6).

    Plan shape: distinct on (src, dst) — map-side partial dedup — then one
    hash agg on dst. Both exchanges are edge-key-sized; no window, no join.
    Skewed mega-hosts (everyone links to them) are single hot KEYS only in
    the final count agg, where partial aggregation already collapses them
    per map task, so no salting is needed.
    """
    return (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .groupBy("dst")
        .agg(F.count("*").cast("long").alias("fanin"))
        .select(
            "dst",
            "fanin",
            F.round(F.log(F.lit(1.0) + F.col("fanin")), 6).alias("prior"),
        )
    )


def trustrank(
    edges: DataFrame,
    trusted: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration TrustRank over ``edges(src, dst)`` + ``trusted(id)``.

    PageRank with the teleport vector restricted to a vetted seed set
    (Gyongyi et al., VLDB 2004): ``tr = (1-d)*t + d*sum_in(tr/outdeg)``
    where ``t(id) = 1/|T|`` for trusted ids, else 0. Trust flows OUT from
    curated seeds, so spam farms that bootstrap rank from their own link
    mass score near zero — this is the frontier-priority signal a crawler
    uses to spend budget on reputable hosts first, complementing raw
    PageRank (pagerank() above) which a link farm can inflate. Init is
    ``r0 = t`` (mass starts on the seeds), matching the paper and making
    each iteration's result closed-form for the DuckDB oracle.

    Scale notes: identical dataflow to pagerank — the edge list (the
    100-TB side) is weighted and repartitioned by src ONCE; each
    iteration shuffles only the node-sized rank vector. The trusted set
    is tiny (hand-vetted), so the ``t`` column is built with one
    broadcast left join onto the persisted node list; no per-iteration
    cost. Dangling mass is dropped, as in pagerank (deterministic,
    oracle-chainable).
    """
    edges = edges.select("src", "dst").distinct()
    t_small = trusted.select(F.col("id").alias("_tid")).distinct()
    # the node universe includes trusted seeds NOT yet in the link graph:
    # a vetted seed with no harvested links still holds its teleport mass
    # (tr >= (1-d)/|T|), and n_trusted counts it — dropping it would both
    # lose its row and deflate every other score
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .union(t_small.select(F.col("_tid").alias("id")))
        .distinct()
    )
    n_trusted = t_small.count()
    if n_trusted == 0:
        return nodes.withColumn("tr", F.lit(0.0))
    nodes = (
        nodes.join(F.broadcast(t_small), nodes["id"] == F.col("_tid"), "left")
        .select(
            "id",
            F.when(F.col("_tid").isNotNull(), F.lit(1.0 / n_trusted))
            .otherwise(F.lit(0.0))
            .alias("t"),
        )
        .persist()
    )
    nodes.count()

    outdeg = edges.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    weighted = (
        edges.join(outdeg, on="src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition("src")
        .persist()
    )
    weighted.count()

    ranks = nodes.select("id", F.col("t").alias("tr"))
    for _ in range(iters):
        contrib = (
            weighted.join(ranks, on=weighted["src"] == ranks["id"])
            .groupBy("dst")
            .agg(F.sum(F.col("tr") * F.col("w")).alias("contrib"))
        )
        ranks = nodes.join(
            contrib, on=nodes["id"] == contrib["dst"], how="left"
        ).select(
            "id",
            (
                F.lit(1.0 - damping) * F.col("t")
                + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
            ).alias("tr"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    weighted.unpersist()
    nodes.unpersist()
    return ranks


def seed_hop_distance(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """Bounded BFS: hop distance from the seed set over the link graph.

    The crawl-scheduling counterpart of path depth (depth_budget uses the
    URL's own path; this uses the LINK graph): pages few hops from vetted
    seeds are crawled first and deep link-chains are budget-capped — the
    canonical "crawl depth" frontier label. Unreached nodes within
    ``max_hops`` are absent from the output (a frontier treats them as
    depth ∞ / lowest priority).

    Returns (id, hops) — the MINIMUM hop count ≤ max_hops from any seed.

    Scale notes: same iteration discipline as pagerank/trustrank — each of
    the K (small, fixed) rounds joins the CURRENT layer (node-sized,
    shrinking) against the edge list pre-partitioned by src ONCE; the
    min-combine is a map-side-combinable hash agg. lineage truncated per
    round with an eager localCheckpoint. K is a literal, so a DuckDB
    oracle chains K closed-form CTEs.
    """
    edges = edges.select("src", "dst").distinct()
    part_edges = edges.repartition("src").persist()
    part_edges.count()

    # type-agnostic like pagerank/trustrank: ids may be longs OR strings
    # (the engine's own url_key format is a string) — no cast, the join
    # resolves on whatever type the caller's graph uses
    dist = seeds.select("id").distinct().withColumn("hops", F.lit(0))
    for _ in range(max_hops):
        expanded = (
            part_edges.join(dist, on=part_edges["src"] == dist["id"])
            .select(F.col("dst").alias("id"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(expanded)
            .groupBy("id")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=True)
        )
    part_edges.unpersist()
    return dist.select("id", F.col("hops").cast("int").alias("hops"))


def outlink_spam_ratio(
    edges: DataFrame,
    blocklist: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Per-host spam-neighborhood signal: fraction of outlinks into
    blocklisted hosts.

    The complement of the inbound blocklist_filter (functions/urls.py):
    a host not ON the list but LINKING mostly into it is a spam-farm
    member the list hasn't caught yet (the SpamRank/anti-trust
    observation — link neighborhoods, not just identities). Feeds the
    frontier as a negative prior next to trustrank.

    Returns (src_host, n_out, n_spam, spam_ratio, suspect) with
    spam_ratio rounded to 6 dp and the flag integer cross-multiplied
    (``2 * n_spam >= n_out`` — half or more), so the oracle is exact.

    Scale notes: the edge list — the 100-TB side — takes ONE hash agg on
    src after a broadcast membership probe against the blocklist dim
    (hand-curated, KB-sized); no edge-sized shuffle on a blocklist key,
    mirroring blocklist_filter's design. Edges are deduped on (src, dst)
    first — consistent with trustrank/seed_hop_distance — so repeated
    identical links (a nav bar on every page) can't inflate n_out/n_spam
    or flip the suspect flag (r4 ADVICE); the distinct's shuffle folds
    into the groupBy(src) exchange under AQE.
    """
    probe = F.broadcast(
        blocklist.select(F.col("host").alias("_bh")).distinct()
    )
    uniq = edges.select(src_col, dst_col).distinct()
    j = uniq.join(probe, uniq[dst_col] == F.col("_bh"), "left")
    agg = j.groupBy(src_col).agg(
        F.count("*").cast("long").alias("n_out"),
        F.sum(F.col("_bh").isNotNull().cast("long")).alias("n_spam"),
    )
    return agg.select(
        F.col(src_col).alias("src_host"),
        "n_out",
        "n_spam",
        F.round(F.col("n_spam") / F.col("n_out"), 6).alias("spam_ratio"),
        (2 * F.col("n_spam") >= F.col("n_out")).alias("suspect"),
    )
