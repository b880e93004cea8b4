"""Round-4 late additions, batch 2: duplicated-substring spans, Zipf
slope, host fan-in prior, URL alias groups, token-budget curve —
semantics the per-query DuckDB oracles can't pin alone (span merging
across gaps, slope on a known distribution, canonical tie-break,
cumulative-share monotonicity)."""

import math

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.dedup import duplicate_spans
from etherscan_contract_crawler_spark.analytics.graph import host_fanin
from etherscan_contract_crawler_spark.analytics.stats import token_budget
from etherscan_contract_crawler_spark.analytics.text import zipf_slope
from etherscan_contract_crawler_spark.operators.dedup import url_alias_groups


def test_duplicate_spans_merges_runs_and_keeps_gaps(spark):
    # doc 1 and doc 2 share words 0..6 (grams 0,1,2 with n=4) and words
    # 10..14 (one gram at pos 10 in doc 1) — two SEPARATE spans in doc 1,
    # not one merged blob across the unique middle.
    shared_head = "alpha beta gamma delta epsilon zeta eta"
    shared_tail = "omega psi chi phi"
    d1 = f"{shared_head} u1 u2 u3 {shared_tail} t1 t2"
    d2 = f"{shared_head} v1 v2 v3 {shared_tail} s1 s2"
    docs = spark.createDataFrame([(1, d1), (2, d2)], ["doc_id", "text"])
    out = duplicate_spans(docs, n=4).collect()
    spans = {(r.doc_id, r.span_start, r.span_end, r.span_words) for r in out}
    # head: gram starts 0..3 (words 0..6) -> span [0, 6], 7 words
    # tail: words 10..13 -> gram start 10 -> span [10, 13], 4 words
    assert (1, 0, 3 + 3, 7) in spans
    assert (1, 10, 13, 4) in spans
    assert (2, 0, 6, 7) in spans and (2, 10, 13, 4) in spans
    assert len(spans) == 4  # nothing merged across the unique middles


def test_duplicate_spans_within_doc_repeat_not_marked(spark):
    # a gram repeated WITHIN one doc but nowhere else has doc-freq 1
    docs = spark.createDataFrame(
        [(1, "a b c d x y z a b c d"), (2, "totally different words here")],
        ["doc_id", "text"],
    )
    assert duplicate_spans(docs, n=4).count() == 0


def test_duplicate_spans_max_doc_freq_drops_boilerplate(spark):
    # the same 4 words in every doc; with max_doc_freq=2 the ubiquitous
    # gram is excluded, so no spans survive
    docs = spark.createDataFrame(
        [(i, "same four words here") for i in range(5)], ["doc_id", "text"]
    )
    assert duplicate_spans(docs, n=4).count() == 5  # exact path: one span/doc
    assert duplicate_spans(docs, n=4, max_doc_freq=2).count() == 0


def test_zipf_slope_recovers_planted_exponent(spark):
    # plant an exact Zipf law: token w_r appears round(1000 / r) times ->
    # the log-log regression over ranks 1..20 must sit near -1
    rows = []
    for r in range(1, 21):
        rows += [("en", f"w{r:02d}")] * round(1000 / r)
    docs = (
        spark.createDataFrame(rows, ["lang", "tok"])
        .groupBy("lang")
        .agg(F.concat_ws(" ", F.collect_list("tok")).alias("text"))
    )
    out = zipf_slope(docs, k=20).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_terms == 20 and row.top_token == "w01"
    assert abs(row.zipf_slope - (-1.0)) < 0.01  # rounding of counts only


def test_host_fanin_distinct_srcs_and_prior(spark):
    edges = spark.createDataFrame(
        [(1, 9), (1, 9), (2, 9), (3, 9), (1, 8)], ["src", "dst"]
    )
    out = {r.dst: r for r in host_fanin(edges).collect()}
    assert out[9].fanin == 3 and out[8].fanin == 1
    assert abs(out[9].prior - round(math.log(4.0), 6)) < 1e-9


def test_url_alias_groups_canonical_is_min_surt(spark):
    pages = spark.createDataFrame(
        [
            # same bytes behind three hosts; zzz would win a plain min(url)
            ("https://ZZZ.aaa-first.com/x", "<html>A</html>"),
            ("https://mirror.example.com/x?b=1", "<html>A</html>"),
            ("http://www.example.net/x", "<html>A</html>"),
            # singleton group must be filtered out
            ("https://solo.example.org/", "<html>B</html>"),
        ],
        ["url", "content"],
    )
    out = url_alias_groups(pages).collect()
    assert len(out) == 1
    g = out[0]
    # SURT order: com,aaa-first,zzz)... < com,example,mirror)... < net,...
    assert g.canonical_url == "https://ZZZ.aaa-first.com/x"
    assert g.n_aliases == 3 and g.n_hosts == 3


def test_token_budget_cumulative_share_descends_buckets(spark):
    scored = spark.createDataFrame(
        [
            ("en", 4, 100), ("en", 4, 100),  # top bucket: 200 tokens
            ("en", 2, 300),
            ("en", 0, 500),
            ("de", 1, 50),
        ],
        ["lang", "q_bucket", "n_tokens"],
    )
    out = {(r.lang, r.bucket): r for r in token_budget(scored).collect()}
    assert out[("en", 4)].n_docs == 2 and out[("en", 4)].bucket_tokens == 200
    assert out[("en", 4)].cum_tokens == 200
    assert out[("en", 2)].cum_tokens == 500
    assert out[("en", 0)].cum_tokens == 1000
    assert abs(out[("en", 2)].cum_share - 0.5) < 1e-9
    assert out[("en", 0)].cum_share == 1.0
    assert out[("de", 1)].cum_share == 1.0


def test_span_dedup_plan_has_partial_windowgrouplimit_free_shape(spark):
    # plan audit: the span operator must contain exactly one window sort
    # (doc-partitioned islands) and no cartesian/broadcast-nested-loop
    docs = spark.createDataFrame([(1, "a b c d e"), (2, "a b c d e")], ["doc_id", "text"])
    plan = duplicate_spans(docs, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdx_revisits_runs_and_payload_seq(spark):
    caps = spark.createDataFrame(
        [
            # url A: d1 d1 d2 d1 -> new, revisit, new, new (run broken)
            ("A", 1, "d1"), ("A", 2, "d1"), ("A", 3, "d2"), ("A", 4, "d1"),
            # url B: single capture, never a revisit
            ("B", 1, "d9"),
        ],
        ["urlkey", "ts", "digest"],
    )
    from etherscan_contract_crawler_spark.operators.recrawl import cdx_revisits

    out = {(r.urlkey, r.ts): r for r in cdx_revisits(caps).collect()}
    assert [out[("A", t)].is_revisit for t in (1, 2, 3, 4)] == [
        False, True, False, False]
    assert [out[("A", t)].payload_seq for t in (1, 2, 3, 4)] == [1, 1, 2, 3]
    assert out[("B", 1)].is_revisit is False and out[("B", 1)].payload_seq == 1


def test_cdx_revisits_single_window_exchange(spark):
    caps = spark.createDataFrame([("A", 1, "d")], ["urlkey", "ts", "digest"])
    from etherscan_contract_crawler_spark.operators.recrawl import cdx_revisits

    plan = cdx_revisits(caps)._jdf.queryExecution().executedPlan().toString()
    # lag + running sum share one sort/partition spec -> ONE Window node,
    # one exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_weighted_sample_deterministic_and_weight_biased(spark):
    from etherscan_contract_crawler_spark.analytics.sampling import weighted_sample

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, ["key", "w"])
    s1 = weighted_sample(df, "key", "w", k=60)
    got1 = sorted(r.key for r in s1.collect())
    # identical under a different partitioning (determinism, the property
    # df.sample lacks)
    got2 = sorted(
        r.key for r in weighted_sample(df.repartition(17), "key", "w", k=60).collect()
    )
    assert got1 == got2
    # weight bias: heavy keys carry 5000/6950 of total weight, so E[heavy
    # among 60] ~ 43 (this fixed hash draw gives 35); an UNWEIGHTED sample
    # would pick 60 * 50/2000 = 1.5 — assert far above that
    heavy = sum(1 for k in got1 if k < 50)
    assert heavy >= 25


def test_weighted_sample_plan_is_topk_not_full_sort(spark):
    from etherscan_contract_crawler_spark.analytics.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("key"), F.lit(1.0).alias("w")
    )
    plan = weighted_sample(df, "key", "w", k=10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_rel_canonical_orderings_quotes_and_decoys(spark):
    from etherscan_contract_crawler_spark.functions.html import rel_canonical

    rows = [
        # rel-then-href, self after host-case canonicalization
        (1, '<link rel="canonical" href="HTTPS://EX.COM/a">', "https://ex.com/a"),
        # href-then-rel, different target
        (2, "<link href='https://ex.com/b' rel='canonical'>", "https://ex.com/a"),
        # stylesheet decoy + a real canonical later in the page
        (3, '<link rel="stylesheet" href="/x.css">'
            '<link rel="canonical" href="https://ex.com/c">', "https://ex.com/c"),
        # no declaration
        (4, "<p>none</p>", "https://ex.com/d"),
        # canonical token must not match inside another word
        (5, '<link rel="noncanonicalish" href="https://ex.com/e">',
         "https://ex.com/e"),
    ]
    df = spark.createDataFrame(rows, ["i", "body", "url"])
    out = {
        r.i: r
        for r in df.select(
            "i", rel_canonical("body", "url").alias("c")
        ).select("i", "c.canonical_url", "c.is_self").collect()
    }
    assert out[1].canonical_url == "HTTPS://EX.COM/a" and out[1].is_self is True
    assert out[2].canonical_url == "https://ex.com/b" and out[2].is_self is False
    assert out[3].canonical_url == "https://ex.com/c" and out[3].is_self is True
    assert out[4].canonical_url is None and out[4].is_self is None
    assert out[5].canonical_url is None


def test_duplicate_coverage_exact_under_span_overlap(spark):
    from etherscan_contract_crawler_spark.analytics.dedup import duplicate_coverage

    # doc 1 vs doc 2: grams at starts 0..1 and 5 are duplicated (n=4).
    # Maximal spans [0,4] and [5,8] meet at the boundary; covered distinct
    # words = {0..4} ∪ {5..8} = 9, while doc length is 12 — the distinct
    # count must not double-count had they overlapped.
    common = "a b c d e"           # starts 0,1 cover words 0..4
    tail = "p q r s"               # start 5 covers words 5..8
    d1 = f"{common} {tail} x y z"
    d2 = f"{common} {tail} q r s"  # different tail filler
    docs = spark.createDataFrame([(1, d1), (2, d2)], ["doc_id", "text"])
    out = {r.doc_id: r for r in duplicate_coverage(docs, n=4).collect()}
    assert out[1].n_words == 12
    assert out[1].dup_words == 9
    assert abs(out[1].dup_frac - round(9 / 12, 6)) < 1e-9
    # a doc with no duplicated gram still gets a row with zeros
    solo = spark.createDataFrame(
        [(1, "unique words only here"), (2, "other unique text there")],
        ["doc_id", "text"],
    )
    zout = {r.doc_id: r for r in duplicate_coverage(solo, n=4).collect()}
    assert zout[1].dup_words == 0 and zout[1].dup_frac == 0.0


def test_cdx_revisits_obs_tiebreak_total_order(spark):
    from etherscan_contract_crawler_spark.operators.recrawl import cdx_revisits

    # two captures share ts=5; obs id orders them: obs 1 (d1) then obs 2
    # (d2) -> the d1 capture is a revisit of ts=1, the d2 one is new
    caps = spark.createDataFrame(
        [("A", 1, 0, "d1"), ("A", 5, 2, "d2"), ("A", 5, 1, "d1")],
        ["urlkey", "ts", "obs", "digest"],
    )
    out = {
        (r.ts, r.digest): r
        for r in cdx_revisits(caps, obs_col="obs").collect()
    }
    assert out[(5, "d1")].is_revisit is True   # follows ts=1 d1
    assert out[(5, "d2")].is_revisit is False  # digest changed
    assert out[(5, "d2")].payload_seq == 2
